"""Two-parallelism scaling evidence for the north rule.

A real N→4N-executor cluster is not available in this sandbox, so the
proxy mandated by the driver: run the SAME index-build job on the SAME
input at local[8] and local[32] (fresh JVM each, via subprocess) and
report throughput at both plus scaling efficiency
``eff = (turns/sec@32) / (turns/sec@8) / 4``.

Usage: python tools/scaling_bench.py [replicate]   (default 16)
Writes one JSON line to stdout; paste into BASELINE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, tempfile, time, shutil
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from lucene_spark.analysis import Analyzer
from lucene_spark.data import synthesize_transcripts
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.session import get_spark

cpus = int(sys.argv[1]); replicate = int(sys.argv[2])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
tr = (synthesize_transcripts(docs)
      .crossJoin(spark.range(replicate).select(F.col("id").alias("rep")))
      .select(F.concat_ws("_", "conv_id", F.col("rep").cast("string")).alias("conv_id"),
              "turn_idx", "role", "text", "tool", "ts"))
tr = tr.persist(); n = tr.count()  # materialize input before the clock
d = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
t0 = time.time()
cfg = IndexConfig(field_policy={"text": "text", "conv_id": "keyword",
                                "role": "keyword", "tool": "keyword"},
                  analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="bench"),
                  seg_size=4096, segments_per_commit=1024)
ix = build_index(spark, tr, d, cfg, order_cols=["conv_id", "turn_idx"])
dt = time.time() - t0
print("RESULT " + json.dumps({"cpus": cpus, "n_turns": ix.n_docs,
                              "build_sec": round(dt, 3),
                              "turns_per_sec": round(ix.n_docs / dt, 1)}))
shutil.rmtree(d, ignore_errors=True)
spark.stop()
"""


def run(cpus: int, replicate: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cpus), str(replicate)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
    raise RuntimeError(f"no RESULT from local[{cpus}] run")


def main():
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_c = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi_c = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    # alternate parallelism levels so page-cache warmth is balanced;
    # report the best trial per level (steady-state throughput)
    runs = {lo_c: [], hi_c: []}
    for _ in range(trials):
        runs[hi_c].append(run(hi_c, replicate))
        runs[lo_c].append(run(lo_c, replicate))
    lo = min(runs[lo_c], key=lambda r: r["build_sec"])
    hi = min(runs[hi_c], key=lambda r: r["build_sec"])
    eff = hi["turns_per_sec"] / lo["turns_per_sec"] / 4.0
    print(json.dumps({
        "metric": "index_build_scaling",
        "input": {"sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
                  "replicate": replicate, "n_turns": hi["n_turns"]},
        f"local{lo_c}": lo, f"local{hi_c}": hi,
        f"local{lo_c}_trials": [r["build_sec"] for r in runs[lo_c]],
        f"local{hi_c}_trials": [r["build_sec"] for r in runs[hi_c]],
        f"scaling_efficiency_{lo_c}_to_{hi_c}": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
