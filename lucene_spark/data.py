"""Deterministic transcripts synthesis (the input_hint table shape).

The engine's production input is an Iceberg table of multi-turn
conversation / agent transcripts with columns
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. This module derives such a table deterministically from
the driver's ``documents`` parquet (no external data, no randomness):
each document becomes one conversation, its token stream chunked into
turns of ``turn_tokens`` words, with cycling roles/tools and a synthetic
monotone timestamp. Pure Catalyst expressions → reproducible across
runs, engines and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.ops.dedup import tokens

TURN_TOKENS = 24


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, turn_tokens: int = TURN_TOKENS
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synthesize_transcripts(docs, turn_tokens)


def synthesize_transcripts(
    docs: DataFrame, turn_tokens: int = TURN_TOKENS
) -> DataFrame:
    t = tokens("text")
    n_turns = F.greatest(
        F.lit(1), F.ceil(F.size(t) / F.lit(float(turn_tokens))).cast("int")
    )
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda i: F.struct(
            i.cast("int").alias("turn_idx"),
            F.concat_ws(
                " ", F.slice(t, i * turn_tokens + 1, turn_tokens)
            ).alias("text"),
        ),
    )
    exploded = docs.select(
        F.format_string("conv%08d", F.col("doc_id")).alias("conv_id"),
        F.col("doc_id"),
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
            + F.make_interval(secs=F.col("doc_id") * 3600 + F.col("turn.turn_idx") * 60)
        ).alias("ts"),
    )
