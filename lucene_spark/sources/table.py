"""Transcripts input seam: Iceberg catalog tables or parquet paths.

The north rule targets Iceberg tables of transcripts. The entire engine
consumes plain DataFrames (``build_index(spark, df, …)``), so Iceberg
support is this one seam: a catalog identifier goes through
``spark.read.table`` — Spark's Iceberg integration point, which brings
snapshot isolation, manifest-level partition pruning and row-level
deletes (the tombstone analogue) for free — while a filesystem path is
read as parquet, the sandbox stand-in (this container ships no Iceberg
runtime; on a real cluster add the iceberg-spark-runtime jar and a
catalog config, nothing in this package changes).

Time-travel knobs map straight through DataFrame reader options
(``option("snapshot-id", …)`` / ``option("as-of-timestamp", …)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Read a transcripts table from an Iceberg/catalog identifier
    (``cat.db.transcripts`` — anything without a path separator) or a
    parquet directory path. Returns the raw DataFrame; column presence
    is validated against the input contract."""
    import os

    # a real filesystem path wins even without a separator (a relative
    # parquet dir name would otherwise misroute to the catalog)
    if "/" in source or source.endswith(".parquet") or os.path.exists(source):
        df = spark.read.parquet(source)
    else:
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        df = reader.table(source)
    missing = [c for c in ("conv_id", "turn_idx", "text") if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcripts source {source!r} is missing required columns {missing}"
        )
    return df
