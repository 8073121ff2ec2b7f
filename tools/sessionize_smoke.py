"""Sessionization scale smoke: batch gap-sessionize at tens of
millions of turns, plus a stateful-streaming pass, with analytic
per-row verification over the FULL output.

The corpus is the input_hint transcript shape with KNOWN session
structure, synthesized in pure Catalyst: 100-turn conversations where
the inter-turn gap is 60 s except every 10th turn, which pauses long
enough (1000 s > the 90 s threshold) to open a new session. So for
turn t:

    ts(t)                 = 60_000*t + 1_000_000*(t div 10)
    session_idx(t)        = t div 10              (10 per conversation)
    session_start_ms(t)   = ts(10 * session_idx(t))

Both the batch plan (shuffle on conv + codegen windows) and the
streaming plan (applyInPandasWithState over range-ordered micro-
batches) are verified against those closed forms on EVERY row —
mismatch counts are computed distributed and asserted zero, which also
forces full evaluation for an honest throughput clock.

Usage: python tools/sessionize_smoke.py [n_batch] [n_stream]
(defaults 40_000_000 and 4_000_000; the stream side replays its slice
in 8 turn-range micro-batches so state continuity is on the hot path).
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from lucene_spark.session import get_spark  # noqa: E402
from lucene_spark.streaming.sessionize import (  # noqa: E402
    sessionize,
    sessionize_stream,
)

TURNS_PER_CONV = 100
TURNS_PER_SESS = 10
GAP_MS = 90_000
STEP_MS = 60_000
PAUSE_MS = 1_000_000  # extra gap before every 10th turn
N_STREAM_BATCHES = 8


def synth_turns(spark, n: int) -> DataFrame:
    """input_hint-shaped turns with closed-form session structure."""
    n_convs = max(n // TURNS_PER_CONV, 1)
    t = (F.col("id") / n_convs).cast("long").alias("turn_idx")
    return spark.range(n).select(
        F.concat(F.lit("c"), (F.col("id") % n_convs).cast("string")).alias(
            "conv_id"
        ),
        t,
        (
            F.lit(STEP_MS) * F.col("turn_idx")
            + F.lit(PAUSE_MS) * (F.col("turn_idx") / TURNS_PER_SESS).cast("long")
        ).alias("ts_ms"),
    )


def expected_cols():
    s = (F.col("turn_idx") / TURNS_PER_SESS).cast("long")
    start = (
        F.lit(STEP_MS) * (s * TURNS_PER_SESS) + F.lit(PAUSE_MS) * s
    ).cast("long")
    return s.alias("exp_idx"), start.alias("exp_start")


def count_mismatches(out: DataFrame) -> int:
    """Rows where the engine disagrees with the closed form (forces
    full evaluation of the sessionized plan)."""
    e_idx, e_start = expected_cols()
    return (
        out.withColumn("exp_idx", e_idx)
        .withColumn("exp_start", e_start)
        .where(
            (F.col("session_idx") != F.col("exp_idx"))
            | (F.col("session_start_ms") != F.col("exp_start"))
        )
        .count()
    )


def main():
    n_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_stream = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="sessionize_smoke",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = {"n_batch": n_batch, "n_stream": n_stream, "cpus": cpus}

    # --- batch ---------------------------------------------------------
    turns = synth_turns(spark, n_batch)
    t0 = time.time()
    out = sessionize(turns, gap_ms=GAP_MS)
    bad = count_mismatches(out)
    t_batch = time.time() - t0
    assert bad == 0, f"batch sessionize disagreed on {bad} rows"
    report["batch"] = {
        "sec": round(t_batch, 1),
        "turns_per_sec": round(n_batch / t_batch),
        "mismatches": bad,
    }
    print("batch:", report["batch"], flush=True)

    # --- streaming (turn-range micro-batches -> state continuity) ------
    d = tempfile.mkdtemp(prefix="sess_smoke_")
    try:
        src = os.path.join(d, "src")
        sink = os.path.join(d, "sink")
        strm = synth_turns(spark, n_stream)
        # one file per turn range, written in order, so the file source
        # replays them as monotone micro-batches per conversation
        per = TURNS_PER_CONV // N_STREAM_BATCHES
        for i in range(N_STREAM_BATCHES):
            (
                strm.where(
                    (F.col("turn_idx") >= i * per)
                    & (
                        F.col("turn_idx") < (i + 1) * per
                        if i < N_STREAM_BATCHES - 1
                        else F.lit(True)
                    )
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
            time.sleep(0.05)  # distinct mtimes -> deterministic replay order

        stream = (
            spark.readStream.schema("conv_id string, turn_idx long, ts_ms long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def write_batch(bdf, _bid):
            bdf.write.mode("append").parquet(sink)

        t0 = time.time()
        q = (
            sessionize_stream(stream, gap_ms=GAP_MS)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        t_stream = time.time() - t0

        got = spark.read.parquet(sink)
        n_got = got.count()
        assert n_got == n_stream, (n_got, n_stream)
        # update mode re-keys on (conv, ts); re-derive turn_idx for the
        # closed-form compare
        n_convs = max(n_stream // TURNS_PER_CONV, 1)
        with_turn = got.withColumn(
            "turn_idx",
            (
                (
                    F.col("ts_ms")
                    % (TURNS_PER_SESS * STEP_MS + PAUSE_MS)
                )
                / STEP_MS
            ).cast("long")
            + (
                F.col("ts_ms") / (TURNS_PER_SESS * STEP_MS + PAUSE_MS)
            ).cast("long")
            * TURNS_PER_SESS,
        )
        bad_s = count_mismatches(with_turn)
        assert bad_s == 0, f"stream sessionize disagreed on {bad_s} rows"
        report["stream"] = {
            "sec": round(t_stream, 1),
            "turns_per_sec": round(n_stream / t_stream),
            "micro_batches": N_STREAM_BATCHES,
            "conversations": n_convs,
            "mismatches": bad_s,
        }
        print("stream:", report["stream"], flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
