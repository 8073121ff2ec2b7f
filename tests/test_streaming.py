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


class TestSessionize:
    """Gap sessionization: batch window plan vs the stateful streaming
    kernel (applyInPandasWithState) — same numbering on the same turns."""

    def _turns(self, spark):
        # 3 conversations with engineered gaps (gap_ms=90_000):
        # a: 0, 60k, 200k(+140k -> new), 260k           => sessions 0,0,1,1
        # b: 0                                           => session 0
        # c: 0, 100k(+100k -> new), 190k, 300k(+110k ->) => 0,1,1,2
        rows = [
            ("a", 0), ("a", 60_000), ("a", 200_000), ("a", 260_000),
            ("b", 0),
            ("c", 0), ("c", 100_000), ("c", 190_000), ("c", 300_000),
        ]
        return spark.createDataFrame(rows, "conv_id string, ts_ms long")

    EXPECT = {
        ("a", 0): (0, 0), ("a", 60_000): (0, 0),
        ("a", 200_000): (1, 200_000), ("a", 260_000): (1, 200_000),
        ("b", 0): (0, 0),
        ("c", 0): (0, 0), ("c", 100_000): (1, 100_000),
        ("c", 190_000): (1, 100_000), ("c", 300_000): (2, 300_000),
    }

    def test_batch_sessionize(self, spark):
        from lucene_spark.streaming.sessionize import sessionize

        got = {
            (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
            for r in sessionize(self._turns(spark), gap_ms=90_000).collect()
        }
        assert got == self.EXPECT
        with pytest.raises(ValueError):
            sessionize(self._turns(spark), gap_ms=-1)

    def test_stream_matches_batch(self, spark, tmp_path):
        """Feed the same turns as TWO in-order micro-batches
        (maxFilesPerTrigger=1); the state-store numbering must equal
        the batch result — including sessions continuing across the
        batch boundary (conv a's session 1 spans both files)."""
        from lucene_spark.streaming.sessionize import sessionize_stream

        df = self._turns(spark)
        early = df.where(F.col("ts_ms") <= 100_000)
        late = df.where(F.col("ts_ms") > 100_000)
        sdir = str(tmp_path / "sess_in")
        early.coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f1"))
        late.coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f2"))

        stream = (
            spark.readStream.schema("conv_id string, ts_ms long")
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir + "/*")
        )
        out = sessionize_stream(stream, gap_ms=90_000)
        q = (
            out.writeStream.format("memory")
            .queryName("sess_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
            for r in spark.sql("SELECT * FROM sess_test").collect()
        }
        assert got == self.EXPECT

    def test_negative_timestamps_match_batch(self, spark, tmp_path):
        """Negative ts_ms (pre-epoch / relative clocks) must not reset
        sessions: the stream kernel's no-state sentinel is session_idx,
        not last_ts (review fix)."""
        from lucene_spark.streaming.sessionize import (
            sessionize,
            sessionize_stream,
        )

        df = spark.createDataFrame(
            [("n", -120_000), ("n", -60_000), ("n", 100_000)],
            "conv_id string, ts_ms long",
        )
        batch = {
            (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
            for r in sessionize(df, gap_ms=90_000).collect()
        }
        # -120k -> -60k is a 60s gap (same session); -60k -> 100k is new
        assert batch[("n", -120_000)] == (0, -120_000)
        assert batch[("n", -60_000)] == (0, -120_000)
        assert batch[("n", 100_000)] == (1, 100_000)

        sdir = str(tmp_path / "neg_in")
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f1"))
        stream = spark.readStream.schema("conv_id string, ts_ms long").parquet(
            sdir + "/*"
        )
        q = (
            sessionize_stream(stream, gap_ms=90_000, state_timeout_ms=3_600_000)
            .writeStream.format("memory")
            .queryName("sess_neg")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_neg"))
            .start()
        )
        # NOTE: with ProcessingTimeTimeout configured, Spark keeps a
        # state-cleanup trigger pending, so processAllAvailable() never
        # returns — poll the sink instead (data itself lands normally)
        import time

        try:
            got = {}
            for _ in range(60):
                got = {
                    (r["conv_id"], r["ts_ms"]): (
                        r["session_idx"], r["session_start_ms"],
                    )
                    for r in spark.sql("SELECT * FROM sess_neg").collect()
                }
                if len(got) >= len(batch):
                    break
                time.sleep(1)
        finally:
            q.stop()
        assert got == batch

    def test_bad_timeout_raises(self, spark):
        from lucene_spark.streaming.sessionize import sessionize_stream

        stream = spark.readStream.format("rate").load().selectExpr(
            "CAST(value AS STRING) AS conv_id", "value AS ts_ms"
        )
        with pytest.raises(ValueError):
            sessionize_stream(stream, state_timeout_ms=0)
