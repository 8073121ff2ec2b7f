"""Streaming endurance (round-4 verdict #6): kill the sessionize query
between micro-batches and prove state continuity from the checkpoint,
and observe state_timeout_ms eviction under a real clock.
"""

import os
import time

import pytest
from pyspark.sql import functions as F


def _collect_sess(spark, name):
    return {
        (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _start(stream_df, tmp_path, qname, **kw):
    """Memory-sink runner (no restart involved — memory sinks cannot
    recover from a checkpoint)."""
    from lucene_spark.streaming.sessionize import sessionize_stream

    return (
        sessionize_stream(stream_df, gap_ms=90_000, **kw)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )


def _start_recoverable(stream_df, tmp_path, run_name):
    """foreachBatch → per-run parquet dir: the restartable shape a real
    pipeline uses (the memory sink refuses checkpoint recovery)."""
    from lucene_spark.streaming.sessionize import sessionize_stream

    out_dir = str(tmp_path / f"out_{run_name}")

    def write_batch(bdf, _bid):
        bdf.write.mode("append").parquet(out_dir)

    q = (
        sessionize_stream(stream_df, gap_ms=90_000)
        .writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    return q, out_dir


def _read_out(spark, out_dir):
    try:
        rows = spark.read.parquet(out_dir).collect()
    except Exception:
        return {}
    return {
        (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
        for r in rows
    }


class TestKillResume:
    def test_state_survives_query_restart(self, spark, tmp_path):
        """Stop the query after the first file, add the second file,
        restart on the SAME checkpoint: conversation state must resume
        from the state store — sessions spanning the kill keep their
        index and start, and a mid-session gap straddling the restart
        still opens a new session with the right numbering."""
        from lucene_spark.streaming.sessionize import sessionize

        # conv a: session 0 = [0, 60k]; the 200k turn (gap 140k > 90k)
        # arrives AFTER the restart -> must become session 1 (state
        # proves last_ts=60k survived the kill). conv b: session 0
        # starts pre-kill at 50k, continues post-kill at 100k (gap 50k
        # <= 90k) -> same session, session_start_ms must remain 50k
        # (start survives the kill too).
        early = [("a", 0), ("a", 60_000), ("b", 50_000)]
        late = [("a", 200_000), ("b", 100_000), ("b", 250_000)]
        full = spark.createDataFrame(early + late, "conv_id string, ts_ms long")
        want = {
            (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
            for r in sessionize(full, gap_ms=90_000).collect()
        }
        # sanity on the engineered shape
        assert want[("a", 200_000)] == (1, 200_000)
        assert want[("b", 100_000)] == (0, 50_000)
        assert want[("b", 250_000)] == (1, 250_000)

        sdir = str(tmp_path / "in")
        spark.createDataFrame(early, "conv_id string, ts_ms long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(sdir, "f1"))
        stream = spark.readStream.schema("conv_id string, ts_ms long").parquet(
            sdir + "/*"
        )
        q1, out1 = _start_recoverable(stream, tmp_path, "run1")
        try:
            q1.processAllAvailable()
            got1 = _read_out(spark, out1)
        finally:
            q1.stop()  # the kill: between micro-batches, state checkpointed
        assert got1 == {k: want[k] for k in got1}
        assert len(got1) == len(early)

        spark.createDataFrame(late, "conv_id string, ts_ms long").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(sdir, "f2"))
        q2, out2 = _start_recoverable(stream, tmp_path, "run2")
        try:
            q2.processAllAvailable()
            got2 = _read_out(spark, out2)
        finally:
            q2.stop()
        # run 2's sink holds only post-restart rows; numbering must
        # continue exactly where the killed run left off
        assert {k: want[k] for k in got2} == got2
        assert ("a", 200_000) in got2 and ("b", 250_000) in got2
        merged = {**got1, **got2}
        assert merged == want

    def test_second_kill_and_third_run_idempotent(self, spark, tmp_path):
        """Two kills: every restart resumes from the checkpoint and no
        turn is ever renumbered (replayed rows keep identical values)."""
        from lucene_spark.streaming.sessionize import sessionize

        batches = [
            [("x", 0), ("y", 10_000)],
            [("x", 50_000), ("y", 200_000)],
            [("x", 300_000), ("y", 260_000)],
        ]
        rows = [r for b in batches for r in b]
        full = spark.createDataFrame(rows, "conv_id string, ts_ms long")
        want = {
            (r["conv_id"], r["ts_ms"]): (r["session_idx"], r["session_start_ms"])
            for r in sessionize(full, gap_ms=90_000).collect()
        }
        sdir = str(tmp_path / "in3")
        stream = spark.readStream.schema("conv_id string, ts_ms long").parquet(
            sdir + "/*"
        )
        merged = {}
        for i, b in enumerate(batches):
            spark.createDataFrame(b, "conv_id string, ts_ms long").coalesce(
                1
            ).write.mode("overwrite").parquet(os.path.join(sdir, f"f{i}"))
            q, out = _start_recoverable(stream, tmp_path, f"multi{i}")
            try:
                q.processAllAvailable()
                got = _read_out(spark, out)
            finally:
                q.stop()
            for k, v in got.items():
                assert want[k] == v, (i, k, v, want[k])
                if k in merged:
                    assert merged[k] == v  # replay idempotency
                merged[k] = v
        assert merged == want


class TestRealClockEviction:
    def test_state_evicted_after_timeout_wall_clock(self, spark, tmp_path):
        """state_timeout_ms under a REAL clock: a conversation idle
        past the timeout is evicted (Spark's pending timeout triggers
        fire between micro-batches), so a later turn within gap_ms
        restarts numbering at session 0 with a NEW session_start —
        the observable eviction signature. A control conversation
        whose second turn arrives immediately keeps its state."""
        sdir = str(tmp_path / "evict_in")
        t1, t2 = 1_000_000, 1_050_000  # 50s apart — WITHIN gap_ms
        spark.createDataFrame(
            [("e", t1), ("ctl", t1)], "conv_id string, ts_ms long"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sdir, "f1"))
        stream = spark.readStream.schema("conv_id string, ts_ms long").parquet(
            sdir + "/*"
        )
        q = _start(stream, tmp_path, "sess_evict", state_timeout_ms=15_000)
        try:
            # phase 1: both convs land with session 0 @ t1
            got = {}
            for _ in range(60):
                got = _collect_sess(spark, "sess_evict")
                if len(got) >= 2:
                    break
                time.sleep(0.5)
            assert got[("e", t1)] == (0, t1)
            # control second turn BEFORE the timeout expires
            spark.createDataFrame(
                [("ctl", t2)], "conv_id string, ts_ms long"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(sdir, "f2")
            )
            for _ in range(60):
                got = _collect_sess(spark, "sess_evict")
                if ("ctl", t2) in got:
                    break
                time.sleep(0.5)
            # state alive: same session, start stays t1
            assert got[("ctl", t2)] == (0, t1)

            # phase 2: idle past the 15s processing-time timeout; the
            # pending cleanup triggers evict conv e's state
            time.sleep(35)
            spark.createDataFrame(
                [("e", t2)], "conv_id string, ts_ms long"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(sdir, "f3")
            )
            for _ in range(120):
                got = _collect_sess(spark, "sess_evict")
                if ("e", t2) in got:
                    break
                time.sleep(0.5)
            # evicted: numbering restarts at 0 with start t2, even
            # though t2 - t1 <= gap_ms would have continued session 0
            # from t1 had the state survived
            assert got[("e", t2)] == (0, t2), got
        finally:
            q.stop()
