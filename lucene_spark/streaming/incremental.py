"""Structured-Streaming incremental index appends (LSM-style delta tier).

The reference's writer buffers documents and flushes fixed-size segments,
then geometrically merges them (Writer.php:220-233,642-742 — B7/B8).
The streaming analog: each micro-batch becomes one DELTA CHUNK — a
self-contained mini-index (posting blocks + docs + term counters) under
``delta/…/batch=<id>`` — and a periodic :func:`merge_delta` compacts all
delta chunks into the base postings (the geometric-merge tier).

Correctness properties:
- **idempotent re-processing**: every per-batch write goes to its own
  ``batch=<id>`` directory with mode=overwrite, and the batch's doc-id
  base is derived from a meta row written under the same key — a
  replayed micro-batch (at-least-once foreachBatch) overwrites itself
  bit-for-bit instead of duplicating.
- **doc-id continuity**: batch N's ids start at
  ``base_n_docs + Σ_{b<N} n_docs(b)`` — insertion order across the
  stream, matching the reference's monotone docID assignment.
- **queryable between merges**: :class:`SparkIndex` unions base and
  delta postings/docs, and aggregates base + delta term counters, so
  searches see streamed docs immediately (an unmerged reference index
  is likewise searchable across its segment list).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index.builder import (
    POSTINGS_SCHEMA,
    IndexConfig,
    SparkIndex,
    _docs_with_lengths,
    _invert_segment,
    load_index,
)

DELTA_DIR = "delta"


def _delta(index_dir: str, *parts: str) -> str:
    return os.path.join(index_dir, DELTA_DIR, *parts)


class IncrementalIndexWriter:
    """foreachBatch sink appending micro-batches as delta chunks."""

    def __init__(self, index_dir: str, cfg: IndexConfig | None = None):
        self.index_dir = index_dir
        self.cfg = cfg or IndexConfig()

    # -- doc-id base bookkeeping ------------------------------------
    def _base_docs(self, spark: SparkSession) -> int:
        with open(os.path.join(self.index_dir, "stats.json")) as fh:
            return json.load(fh)["n_docs"]

    def _batch_base(self, spark: SparkSession, batch_id: int) -> int:
        base = self._base_docs(spark)
        meta_root = _delta(self.index_dir, "meta")
        if os.path.isdir(meta_root) and any(
            e.startswith("batch=") for e in os.listdir(meta_root)
        ):
            # ONE filtered read of the whole meta dir (tiny rows), not a
            # per-batch collect loop — keeps the driver cost O(B) total
            # over a stream's life instead of O(B^2)
            row = (
                spark.read.parquet(meta_root)
                .where(F.col("batch_id") < int(batch_id))
                .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("s"))
                .collect()[0]
            )
            base += int(row["s"])
        return base

    # -- the sink ----------------------------------------------------
    def process_batch(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        cfg = self.cfg
        key = f"batch={int(batch_id)}"
        base = self._batch_base(spark, int(batch_id))

        # micro-batches are small: a single-partition local id stamp
        # keeps insertion order without a shuffle (the batch ALREADY
        # fits one executor's write path; large backfills should use
        # build_index / merge_delta instead)
        from pyspark.sql import Window

        order_cols = [c for c in ("conv_id", "turn_idx") if c in df.columns] or [
            df.columns[0]
        ]
        w = Window.orderBy(*order_cols)
        with_id = df.withColumn(
            "doc_id", (F.row_number().over(w) - 1 + F.lit(base)).cast("long")
        )
        docs = _docs_with_lengths(with_id, cfg).persist()
        n = docs.count()

        docs.write.mode("overwrite").parquet(_delta(self.index_dir, "docs", key))
        seg = docs.withColumn(
            "seg_id", (F.col("doc_id") / F.lit(cfg.seg_size)).cast("long")
        )
        blocks = seg.groupBy("seg_id").applyInPandas(
            _invert_segment(cfg), POSTINGS_SCHEMA
        )
        blocks.write.mode("overwrite").parquet(
            _delta(self.index_dir, "postings", key)
        )
        td = (
            spark.read.parquet(_delta(self.index_dir, "postings", key))
            .groupBy("field", "term")
            .agg(
                F.sum("n").alias("df"),
                F.sum("cf").alias("cf"),
                F.count("*").alias("n_blocks"),
                F.max("block_max_tf").alias("max_tf"),
            )
        )
        td.write.mode("overwrite").parquet(_delta(self.index_dir, "term_dict", key))
        text_fields = [f for f, k in cfg.field_policy.items() if k in ("text", "keyword")]
        aggs = [F.sum(F.col(f"len_{f}")).alias(f"sum_len_{f}") for f in text_fields]
        aggs += [
            F.sum((F.col(f"len_{f}") > 0).cast("long")).alias(f"cnt_{f}")
            for f in text_fields
        ]
        row = docs.agg(*aggs).collect()[0]
        meta = spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(n),
                    int(base),
                    json.dumps(
                        {
                            f: {
                                "sum_len": int(row[f"sum_len_{f}"] or 0),
                                "n_docs_with_field": int(row[f"cnt_{f}"] or 0),
                            }
                            for f in text_fields
                        }
                    ),
                )
            ],
            "batch_id long, n_docs long, doc_base long, field_stats string",
        )
        # meta row LAST — its presence marks the batch durable
        meta.write.mode("overwrite").parquet(_delta(self.index_dir, "meta", key))
        docs.unpersist()


def stream_into_index(
    stream_df: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Wire a streaming DataFrame of transcript turns into the index.

    Returns the started StreamingQuery. With ``trigger_available_now``
    the query drains all available input and stops (backfill mode);
    otherwise it runs continuously per micro-batch.
    """
    writer = IncrementalIndexWriter(index_dir, cfg)
    w = stream_df.writeStream.foreachBatch(writer.process_batch).option(
        "checkpointLocation", checkpoint or os.path.join(index_dir, "_stream_ckpt")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


_MERGE_MARKER = "_merge_commit.json"
_MERGE_TABLES = ("postings", "term_dict", "term_dict_fc", "docs")


def _finish_merge_swap(index_dir: str) -> None:
    """Complete a committed merge: swap every staged ``<name>_new`` dir
    into place, install stats, drop the delta. Idempotent — each step
    guards on what already happened, so a crash anywhere inside the
    swap is repaired by calling this again (the marker written by
    :func:`merge_delta` is the point of no return)."""
    import shutil

    marker = os.path.join(index_dir, _MERGE_MARKER)
    for name in _MERGE_TABLES:
        new = os.path.join(index_dir, name + "_new")
        if os.path.isdir(new):
            cur = os.path.join(index_dir, name)
            if os.path.isdir(cur):
                shutil.rmtree(cur)
            os.rename(new, cur)
    stats_new = os.path.join(index_dir, "stats_new.json")
    if os.path.exists(stats_new):
        os.rename(stats_new, os.path.join(index_dir, "stats.json"))  # atomic
    droot = os.path.join(index_dir, DELTA_DIR)
    if os.path.isdir(droot):
        shutil.rmtree(droot)
    if os.path.exists(marker):
        os.remove(marker)


def recover_merge(index_dir: str) -> bool:
    """If a merge committed but crashed mid-swap, finish it. Returns
    True when recovery ran. Call before opening/merging an index."""
    if os.path.exists(os.path.join(index_dir, _MERGE_MARKER)):
        _finish_merge_swap(index_dir)
        return True
    return False


def merge_delta(index: SparkIndex, cfg: IndexConfig | None = None) -> SparkIndex:
    """Compact all delta chunks into the base index (≙ geometric merge
    tier / optimize without expunge): postings re-range-partitioned with
    the base, term_dict re-aggregated, docs rewritten, stats summed.

    Crash-safe and idempotent: every output is STAGED under
    ``<table>_new`` / ``stats_new.json`` (mode=overwrite — a retried
    merge rewrites the stage bit-for-bit, never double-appends), then a
    commit marker is written, then the staged dirs are atomically
    renamed into place and the delta removed
    (:func:`_finish_merge_swap`). A crash before the marker leaves the
    live index untouched (orphan stages are overwritten next run); a
    crash after it is completed by :func:`recover_merge` on next open.

    Scale note: like the reference's segment merge this rewrites the
    data it touches, so the postings exchange AND the docs rewrite are
    O(base + delta). Run it geometrically (when Σ delta ≳ a constant
    fraction of base), not per micro-batch.
    """
    spark = index.spark
    index_dir = index.index_dir
    if recover_merge(index_dir):
        return load_index(spark, index_dir)
    droot = os.path.join(index_dir, DELTA_DIR)
    if not os.path.isdir(droot):
        return index
    delta_postings = spark.read.parquet(os.path.join(droot, "postings"))
    delta_docs = spark.read.parquet(os.path.join(droot, "docs")).drop("batch")
    metas = spark.read.parquet(os.path.join(droot, "meta")).collect()

    n_merge = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base_postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    merged = (
        base_postings.unionByName(
            delta_postings.select(base_postings.columns), allowMissingColumns=False
        )
        .repartitionByRange(n_merge, "field", "term", "doc_base")
        .sortWithinPartitions("field", "term", "doc_base")
    )
    merged.write.mode("overwrite").parquet(os.path.join(index_dir, "postings_new"))
    td = (
        spark.read.parquet(os.path.join(index_dir, "postings_new"))
        .groupBy("field", "term")
        .agg(
            F.sum("n").alias("df"),
            F.sum("cf").alias("cf"),
            F.count("*").alias("n_blocks"),
            F.max("block_max_tf").alias("max_tf"),
        )
    )
    td.write.mode("overwrite").parquet(os.path.join(index_dir, "term_dict_new"))
    from lucene_spark.codec.frontcode import write_dict_blocks

    write_dict_blocks(
        spark.read.parquet(os.path.join(index_dir, "term_dict_new"))
        .repartitionByRange(n_merge, "field", "term")
        .sortWithinPartitions("field", "term"),
        os.path.join(index_dir, "term_dict_fc_new"),
    )
    base_docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    base_docs.unionByName(delta_docs.select(base_docs.columns)).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "docs_new"))

    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    for m in metas:
        stats["n_docs"] += m["n_docs"]
        for f, fs in json.loads(m["field_stats"]).items():
            if f in stats["fields"]:
                stats["fields"][f]["sum_len"] += fs["sum_len"]
                stats["fields"][f]["n_docs_with_field"] += fs["n_docs_with_field"]
    with open(os.path.join(index_dir, "stats_new.json"), "w") as fh:
        json.dump(stats, fh)

    # point of no return: from here the staged tables are authoritative
    marker = os.path.join(index_dir, _MERGE_MARKER)
    with open(marker + ".tmp", "w") as fh:
        json.dump({"merged_batch_ids": sorted(int(m["batch_id"]) for m in metas)}, fh)
    os.rename(marker + ".tmp", marker)
    _finish_merge_swap(index_dir)
    return load_index(spark, index_dir)
