"""Sequence packing for training pipelines: concatenate-then-chunk.

Pretraining consumes fixed-size context windows; the standard packing
lays documents head-to-tail on a token tape and slices the tape every
``budget`` tokens. Distributed shape: documents are deterministically
hashed into ``n_buckets`` independent tapes (md5 of the id — stable
under re-runs and partitioning, like everything in ``ops.sampling``),
ordered by id within their tape, and each doc's window is
``floor(start_offset / budget)`` — one window function per bucket, so
parallelism = n_buckets and the shuffle carries (id, n_tokens) only.
A doc whose tokens straddle a window boundary belongs to the window its
FIRST token lands in (its start offset), which is exactly the
information a downstream tokenizer/writer needs to materialize the
windows. Pure Catalyst expressions — exactly mirrorable as SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.ops.dedup import md5_long


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """→ (id, bucket, start_offset, win): deterministic tape placement.

    ``budget``: tokens per context window. ``n_buckets``: independent
    tapes (the parallelism unit at scale — 1024 tapes of a 100 TB
    corpus pack concurrently; within a tape the window function is a
    range-partitioned sort on the id).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    bucket = md5_long(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % F.lit(n_buckets)
    src = df.select(
        F.col(id_col).alias("id"),
        F.col(n_tokens_col).cast("long").alias("_n"),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("_n").over(w), F.lit(0))
    return src.select(
        "id",
        "bucket",
        start.alias("start_offset"),
        (start / budget).cast("long").alias("win"),
    )
