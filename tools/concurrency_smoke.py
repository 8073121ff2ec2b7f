"""Concurrent-client serving smoke: QPS + tail latency for the mixed
reference query shapes against ONE warm index as client concurrency
grows — the serving half of the north rule measured the way a search
tier actually runs (many simultaneous queries over a shared index),
not one query at a time.

Each "client" is a driver thread with its own FAIR-scheduler pool
(Spark local properties are thread-local), so concurrent jobs share
executor slots fairly instead of convoying behind the FIFO head.
Correctness is asserted per call: every concurrent result's rounded
score multiset must equal the sequential warm-up run's.

Usage: python tools/concurrency_smoke.py [replicate] [clients ...]
       default: replicate 1600 (~21.7M turns), levels 1 4 8 16
Prints one JSON line; paste into BASELINE.md §9.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lucene_spark.analysis import Analyzer  # noqa: E402
from lucene_spark.data import synthesize_transcripts  # noqa: E402
from lucene_spark.index.builder import IndexConfig, build_index  # noqa: E402
from lucene_spark.search.executor import SparkSearcher  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402

REPS_PER_SHAPE = 6


def _pct(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(p * (len(xs) - 1)))))
    return round(xs[i], 3)


def main():
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    levels = [int(a) for a in sys.argv[2:]] or [1, 4, 8, 16]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="concurrency_smoke", master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/documents.parquet"
    )
    tr = (
        synthesize_transcripts(docs)
        .crossJoin(spark.range(replicate).select(F.col("id").alias("rep")))
        .select(
            F.concat_ws("_", "conv_id", F.col("rep").cast("string")).alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    )
    d = tempfile.mkdtemp(prefix="concurrency_smoke_")
    try:
        t0 = time.time()
        cfg = IndexConfig(
            field_policy={"text": "text", "conv_id": "keyword",
                          "role": "keyword", "tool": "keyword"},
            analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="bench"),
            seg_size=16384, segments_per_commit=1024,
        )
        ix = build_index(spark, tr, d, cfg, order_cols=["conv_id", "turn_idx"])
        build_sec = round(time.time() - t0, 1)
        n_turns = ix.docs.count()
        s = SparkSearcher(ix)
        conv = ix.docs.select("conv_id").limit(1).collect()[0]["conv_id"]

        shapes = [
            ("term", "text:table"),
            ("bool", "+table +spark -vector"),
            ("or", "table spark"),
            ("phrase", '"fast value"'),
            ("sloppy", '"fast value"~2'),
            ("wildcard", "text:tab*"),
            ("fuzzy", "text:table~"),
            ("scoped", f"+conv_id:{conv} +text:table"),
        ]

        def run_one(qs: str):
            t = time.time()
            rows = s.search(qs, k=10, score_mode="bm25",
                            default_field="text").collect()
            return time.time() - t, sorted(
                (round(r["score"], 9) for r in rows), reverse=True
            )

        # warm-up = the sequential baseline AND the parity reference
        # (dictionaries prefetched, page cache hot — steady-state tier)
        expect = {}
        for name, qs in shapes:
            run_one(qs)  # cold pass: warm dict/prefetch caches
            _, expect[name] = run_one(qs)

        sc = spark.sparkContext
        out_levels = {}
        workload = [shapes[i % len(shapes)]
                    for i in range(len(shapes) * REPS_PER_SHAPE)]
        for c in levels:
            def task(item):
                name, qs = item
                # one FAIR pool per client thread: concurrent jobs
                # share slots instead of convoying FIFO
                sc.setLocalProperty(
                    "spark.scheduler.pool", f"client-{threading.get_ident()}"
                )
                lat, scores = run_one(qs)
                assert scores == expect[name], (
                    f"concurrent result diverged for {name} at c={c}"
                )
                return lat

            t0 = time.time()
            with ThreadPoolExecutor(max_workers=c) as pool:
                lats = list(pool.map(task, workload))
            wall = time.time() - t0
            out_levels[str(c)] = {
                "wall_sec": round(wall, 1),
                "qps": round(len(workload) / wall, 2),
                "p50_sec": _pct(lats, 0.50),
                "p95_sec": _pct(lats, 0.95),
            }
            print(f"  c={c}: {out_levels[str(c)]}", file=sys.stderr)

        print(json.dumps({
            "smoke": "concurrent_serving",
            "n_turns": n_turns,
            "build_sec": build_sec,
            "cpus": cpus,
            "queries_per_level": len(workload),
            "shapes": [n for n, _ in shapes],
            "levels": out_levels,
            "parity": "every concurrent call's rounded score multiset "
                      "== sequential warm-up (asserted)",
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
