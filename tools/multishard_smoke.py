"""Multi-shard federation smoke at ≥40M turns (round-4 verdict #4).

The round-4 merged-dictionary + global-stats MultiSearcher path was
tested only at fixture size. This builds the SAME ~40M-turn corpus
twice — once as 4 federated shards (disjoint replica ranges), once as
a single merged index — and asserts shard-count invariance: every
query shape (term, boolean, exact/sloppy phrase, wildcard, fuzzy)
must return the same top-k score multiset from
``MultiSearcher([4 shards], global_stats=True)`` as from a plain
``SparkSearcher`` over the merged build. Wildcard/fuzzy rewrite ONCE
against the merged cross-shard dictionary (heapq-merged term stream —
reference anchor: MultiSearcher.php:370-395,
TermStreamsPriorityQueue.php:222-330).

Score MULTISETS, not doc ids: replicated corpora have massive top-k
ties and the two builds assign different doc ids; scores are compared
at 1e-9 rounding (global stats make shard scoring bit-comparable).

Usage: python tools/multishard_smoke.py [replicate_per_shard] [n_shards]
(default 750 × 4 ≈ 40.7M turns). Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lucene_spark.analysis import Analyzer  # noqa: E402
from lucene_spark.data import synthesize_transcripts  # noqa: E402
from lucene_spark.index.builder import IndexConfig, build_index  # noqa: E402
from lucene_spark.search.executor import SparkSearcher  # noqa: E402
from lucene_spark.search.multi import MultiSearcher  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402

QUERIES = [
    ("term", "text:table"),
    ("bool", "+text:table +text:spark -text:vector"),
    ("phrase", 'text:"fast value"'),
    ("sloppy", 'text:"fast value"~2'),
    ("wildcard", "text:tab*"),
    ("fuzzy", "text:table~"),
]
K = 20


def main():
    rep_per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 750
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="multishard_smoke", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/documents.parquet"
    )
    base = synthesize_transcripts(docs)

    def replicas(lo: int, hi: int):
        return (
            base.crossJoin(
                spark.range(lo, hi).select(F.col("id").alias("rep"))
            ).select(
                F.concat_ws("_", "conv_id", F.col("rep").cast("string")).alias("conv_id"),
                "turn_idx", "role", "text", "tool", "ts",
            )
        )

    cfg = IndexConfig(
        field_policy={"text": "text", "conv_id": "keyword", "role": "keyword",
                      "tool": "keyword"},
        analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="bench"),
        seg_size=16384, segments_per_commit=1024,
    )
    root = tempfile.mkdtemp(prefix="multishard_")
    try:
        # federated build: shard s owns replica range [s·R, (s+1)·R)
        t0 = time.time()
        shards = [
            build_index(
                spark, replicas(s * rep_per_shard, (s + 1) * rep_per_shard),
                f"{root}/shard{s}", cfg, order_cols=["conv_id", "turn_idx"],
            )
            for s in range(n_shards)
        ]
        t_fed_build = time.time() - t0
        ms = MultiSearcher(shards)

        # merged single-index control over the identical corpus
        t0 = time.time()
        merged = build_index(
            spark, replicas(0, n_shards * rep_per_shard),
            f"{root}/merged", cfg, order_cols=["conv_id", "turn_idx"],
        )
        t_merged_build = time.time() - t0
        assert ms.total_docs == merged.n_docs, (ms.total_docs, merged.n_docs)
        ss = SparkSearcher(merged)

        out = {"n_turns": int(merged.n_docs), "n_shards": n_shards,
               "cpus": cpus,
               "fed_build_sec": round(t_fed_build, 1),
               "merged_build_sec": round(t_merged_build, 1),
               "queries": {}}
        for name, qs in QUERIES:
            t0 = time.time()
            fed = ms.search(qs, k=K, global_stats=True).collect()
            t_fed = time.time() - t0
            t0 = time.time()
            one = ss.search(qs, k=K).collect()
            t_one = time.time() - t0
            fs = sorted((round(r["score"], 9) for r in fed), reverse=True)
            os_ = sorted((round(r["score"], 9) for r in one), reverse=True)
            assert fs == os_, (name, fs[:5], os_[:5])
            out["queries"][name] = {
                "federated_sec": round(t_fed, 2),
                "merged_sec": round(t_one, 2),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
