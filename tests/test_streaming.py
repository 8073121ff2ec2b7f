"""Structured-Streaming incremental appends: micro-batches land as
delta chunks, searches see them immediately, merge_delta compacts to
the same state a one-shot batch build produces."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def split_transcripts(spark, transcripts_df, tmp_path):
    """Base = first half of conversations; stream = second half, staged
    as two parquet files (→ two deterministic micro-batches)."""
    base = transcripts_df.where(F.col("conv_id") < "conv00000020")
    s1 = transcripts_df.where(
        (F.col("conv_id") >= "conv00000020") & (F.col("conv_id") < "conv00000030")
    )
    s2 = transcripts_df.where(F.col("conv_id") >= "conv00000030")
    sdir = str(tmp_path / "stream_in")
    s1.coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f1"))
    s2.coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f2"))
    return base, s1, s2, sdir


def test_incremental_append_and_merge(spark, split_transcripts, tmp_path):
    from lucene_spark.index import IndexConfig, build_index, load_index
    from lucene_spark.search.executor import SparkSearcher
    from lucene_spark.streaming import IncrementalIndexWriter, merge_delta

    base, s1, s2, _sdir = split_transcripts
    cfg = IndexConfig(seg_size=100)
    d = str(tmp_path / "ix")
    ix = build_index(spark, base, d, cfg)
    n_base = ix.n_docs

    w = IncrementalIndexWriter(d, cfg)
    w.process_batch(s1, 0)
    w.process_batch(s2, 1)

    ix = load_index(spark, d)  # re-open → delta attached
    assert ix.n_docs == n_base + s1.count() + s2.count()
    # streamed docs are searchable before any merge
    hits = SparkSearcher(ix).search("text:spark", k=0).collect()
    streamed_hits = [r for r in hits if r["doc_id"] >= n_base]
    assert streamed_hits, "delta docs must be searchable pre-merge"

    # idempotent replay: re-processing batch 1 must not change anything
    w.process_batch(s2, 1)
    ix2 = load_index(spark, d)
    assert ix2.n_docs == ix.n_docs
    hits2 = ix2 and SparkSearcher(ix2).search("text:spark", k=0).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in hits] == [
        (r["doc_id"], round(r["score"], 9)) for r in hits2
    ]

    merged = merge_delta(ix2, cfg)
    assert not os.path.isdir(os.path.join(d, "delta"))
    assert merged.n_docs == ix.n_docs
    hits3 = SparkSearcher(merged).search("text:spark", k=0).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in hits3] == [
        (r["doc_id"], round(r["score"], 9)) for r in hits
    ]


def test_readstream_available_now(spark, split_transcripts, tmp_path):
    from lucene_spark.index import IndexConfig, build_index, load_index
    from lucene_spark.streaming import stream_into_index

    base, s1, s2, sdir = split_transcripts
    cfg = IndexConfig(seg_size=100)
    d = str(tmp_path / "ix2")
    build_index(spark, base, d, cfg)

    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(sdir, "*"))
    )
    q = stream_into_index(stream, d, cfg, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    ix = load_index(spark, d)
    assert ix.n_docs == base.count() + s1.count() + s2.count()
