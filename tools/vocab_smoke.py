"""Adversarial-vocabulary build smoke: n docs of 20 never-repeated hash
tokens each (vocab ~= 20n, df=1 everywhere) — the worst dictionary
shape an index build can face, and a real one: web corpora are full of
URLs, ids, hex hashes and typos, so at 100 TB the term dictionary is
billions of entries and almost every posting block holds ONE posting
(the BLOCK_DOC_RANGE split gives sparse terms a block per occupied
range even when df > 1).

What it measures: per-phase build timings (docs / segments / merge /
term_dict / stats) plus docs/sec, and verifies the index by running a
term lookup for a planted needle token. The single-posting fast path
in the segment inverter (builder.py `_invert_segment`) exists because
of this shape — see BASELINE §9.24 for the before/after.

Usage: python tools/vocab_smoke.py [n]     (default 1_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LUCENE_SPARK_BUILD_TIMINGS", "1")

from pyspark.sql import functions as F  # noqa: E402

from lucene_spark.analysis import Analyzer  # noqa: E402
from lucene_spark.index.builder import IndexConfig, build_index  # noqa: E402
from lucene_spark.search.executor import SparkSearcher  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402

NEEDLE = "zephyrquillvocab"


def synth(spark, n: int):
    oid = F.col("id")
    toks = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(
                F.lit("t"), F.hex(F.xxhash64(oid * 31 + j, F.lit("vocab")))
            ),
        ),
    )
    # one planted needle every 100k docs — the parity probe
    text = F.when(
        oid % 100_000 == 0, F.concat(toks, F.lit(" " + NEEDLE))
    ).otherwise(toks)
    turn = (oid % 100).cast("long")
    return spark.range(n).select(
        F.concat(F.lit("c"), (oid / 100).cast("long").cast("string")).alias(
            "conv_id"
        ),
        turn.cast("int").alias("turn_idx"),
        F.when(turn % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias(
            "role"
        ),
        F.lit(None).cast("string").alias("tool"),
        (F.lit(60_000) * turn).alias("ts"),
        text.alias("text"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="vocab_smoke",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(
        field_policy={"text": "text", "conv_id": "keyword", "role": "keyword"},
        analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="pipe"),
        seg_size=16384,
        segments_per_commit=1024,
    )
    d = tempfile.mkdtemp(prefix="vocab_smoke_")
    try:
        t0 = time.time()
        ix = build_index(
            spark, synth(spark, n), d, cfg, order_cols=["conv_id", "turn_idx"]
        )
        wall = time.time() - t0
        ix.set_default_search_field("text")
        t0 = time.time()
        hits = SparkSearcher(ix).search(f"text:{NEEDLE}", k=1000).count()
        q_sec = round(time.time() - t0, 2)
        expect = (n + 100_000 - 1) // 100_000
        assert hits == expect, f"needle df: got {hits}, expected {expect}"
        print(
            json.dumps(
                {
                    "metric": "wide_vocab_build",
                    "n": n,
                    "value": round(wall, 1),
                    "unit": "sec",
                    "docs_per_sec": round(n / wall, 1),
                    "timings": ix.stats.get("build_timings_sec"),
                    "n_terms": spark.read.parquet(
                        os.path.join(d, "term_dict")
                    ).count(),
                    "needle_query_sec": q_sec,
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
