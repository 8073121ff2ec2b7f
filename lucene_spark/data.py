"""Deterministic transcripts synthesis (the input_hint table shape).

The engine's production input is an Iceberg table of multi-turn
conversation / agent transcripts with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. This module derives such a table deterministically from
the driver's ``documents`` parquet (no external data, no randomness):
``docs_per_conv`` consecutive documents form one conversation, each
document's token stream is chunked into turns of ``turn_tokens`` words,
and turn_idx runs dense 0..n-1 across the conversation (the contract's
stable ordering), with cycling roles/tools and a synthetic monotone
timestamp. The per-conversation turn offset uses a window partitioned
by conv_id — parallel across conversations, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from lucene_spark.ops.dedup import tokens

TURN_TOKENS = 24
DOCS_PER_CONV = 16


def transcripts_from_documents(
    spark: SparkSession,
    sf_dir: str,
    turn_tokens: int = TURN_TOKENS,
    docs_per_conv: int = DOCS_PER_CONV,
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synthesize_transcripts(docs, turn_tokens, docs_per_conv)


def synthesize_transcripts(
    docs: DataFrame,
    turn_tokens: int = TURN_TOKENS,
    docs_per_conv: int = DOCS_PER_CONV,
) -> DataFrame:
    t = tokens("text")
    n_turns = F.greatest(
        F.lit(1), F.ceil(F.size(t) / F.lit(float(turn_tokens))).cast("int")
    )
    conv = (F.col("doc_id") / F.lit(docs_per_conv)).cast("long")
    base_docs = docs.select(
        F.col("doc_id"), conv.alias("conv"), t.alias("toks"), n_turns.alias("n_turns")
    )
    w = (
        Window.partitionBy("conv")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    based = base_docs.withColumn(
        "turn_base", F.coalesce(F.sum("n_turns").over(w), F.lit(0)).cast("int")
    )
    turns = F.transform(
        F.sequence(F.lit(0), F.col("n_turns") - 1),
        lambda i: F.struct(
            (F.col("turn_base") + i).cast("int").alias("turn_idx"),
            F.concat_ws(
                " ", F.slice(F.col("toks"), i * turn_tokens + 1, turn_tokens)
            ).alias("text"),
        ),
    )
    exploded = based.select(
        F.format_string("conv%08d", F.col("conv")).alias("conv_id"),
        F.col("conv"),
        F.explode(turns).alias("turn"),
    )
    return exploded.select(
        "conv_id",
        F.col("turn.turn_idx").alias("turn_idx"),
        F.when(F.col("turn.turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.col("turn.text").alias("text"),
        F.when(F.col("turn.turn_idx") % 5 == 3, F.lit("search")).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(
                secs=F.col("conv") * 86400 + F.col("turn.turn_idx") * 60
            )
        ).alias("ts"),
    )
