"""ANN scale smoke: trained-IVF top-k at 10M+ vectors (round-4
verdict #2 — every ann_* number to date was sf-small).

Vectors are synthesized deterministically in pure Catalyst: 256
planted clusters, v = center(id % 256) + 0.5·noise(id), every
component a murmur3-hash-derived uniform in [-0.5, 0.5). The planted
structure makes recall measurable without a stored ground truth: the
query is cluster c's center direction, brute force is the oracle.

Measures, at n_vectors (default 10M, dim 64):
- train_ivf_centroids on a ~100k-row hash sample (practice at 100 TB:
  the quantizer never needs the full corpus; k·dim doubles on the
  driver either way)
- bucket assignment + write of the bucket-partitioned parquet (the
  100-TB layout: bucket = partition key → manifest-level pruning)
- brute-force exact top-k (the baseline single full scan)
- ivf_topk_trained at n_probe 1/4/8 against the PARTITIONED table,
  with recall@10 vs brute force and the partition-pruned input size

Usage: python tools/ann_smoke.py [n_vectors] [noise] [query_mode]
(default 10_000_000, noise 0.5, query_mode ``center``). ``noise``
scales the per-vector perturbation (0.5 = well-separated planted
clusters; 1.5+ = heavily overlapped). ``query_mode``:

- ``center`` — the query is a planted cluster center. At high density
  this is ALWAYS easy: with 10M points in 64 buckets, the exact 10-NN
  sit at distances far smaller than any Voronoi boundary, so recall
  is 1.0 even at n_probe=1 and even at noise 1.5 (measured) — a real
  property of IVF at scale, not a measurement artifact. Recall floor
  asserted at noise <= 0.5.
- ``boundary`` — the query is the midpoint of two planted centers
  whose members land in DIFFERENT trained buckets, i.e. it sits on a
  quantizer Voronoi boundary and its exact 10-NN straddle buckets.
  This is the regime where n_probe measurably TRADES recall for scan
  volume; only monotonicity is asserted — sub-1.0 recall at low
  probes IS the measurement.

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

from lucene_spark.ops.similarity import (  # noqa: E402
    assign_ivf_buckets,
    brute_force_topk,
    ivf_topk_trained,
    train_ivf_centroids,
)
from lucene_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 256     # planted centers
K_IVF = 64           # trained quantizer size
TRAIN_SAMPLE = 100_000
K = 10


def _u(seed_col, j: int, salt: str) -> F.Column:
    """Deterministic uniform in [-0.5, 0.5) from murmur3."""
    return (
        F.pmod(F.hash(seed_col, F.lit(j), F.lit(salt)), F.lit(100_000))
        / 100_000.0
        - 0.5
    )


def synth_vectors(spark, n: int, noise: float = 0.5) -> DataFrame:
    c = (F.col("id") % N_CLUSTERS).alias("c")
    base = spark.range(n).select(F.col("id"), c)
    vec = F.array(*[
        (_u(F.col("c"), j, "center") + noise * _u(F.col("id"), j, "noise"))
        .cast("double")
        for j in range(DIM)
    ])
    return base.select("id", vec.alias("emb"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    noise = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    query_mode = sys.argv[3] if len(sys.argv) > 3 else "center"
    assert query_mode in ("center", "boundary"), query_mode
    hard = noise > 0.5 or query_mode == "boundary"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ann_smoke", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    vecs = synth_vectors(spark, n, noise)

    # --- train on a hash sample ---------------------------------------
    t0 = time.time()
    sample = vecs.where(
        F.pmod(F.hash("id", F.lit("trainsplit")), F.lit(max(1, n // TRAIN_SAMPLE))) == 0
    )
    cents = train_ivf_centroids(sample, "id", "emb", k=K_IVF, n_iter=5)
    t_train = time.time() - t0
    assert len(cents) == K_IVF

    # --- assign + write the bucket-partitioned table ------------------
    d = tempfile.mkdtemp(prefix="ann_smoke_")
    try:
        t0 = time.time()
        assign_ivf_buckets(vecs, "emb", cents, "ivf_bucket").write.partitionBy(
            "ivf_bucket"
        ).parquet(d + "/emb", mode="overwrite")
        t_assign = time.time() - t0
        part = spark.read.parquet(d + "/emb")

        # pure center directions of the 256 planted clusters (noise=0)
        # with their trained-bucket assignment — tiny (256 rows)
        centers = {
            r["id"]: ([float(x) for x in r["emb"]], r["ivf_bucket"])
            for r in assign_ivf_buckets(
                synth_vectors(spark, N_CLUSTERS, 0.0),
                "emb", cents, "ivf_bucket",
            ).collect()
        }
        if query_mode == "center":
            q = centers[7][0]
        else:
            # midpoint of cluster 7 and the first cluster quantized to
            # a DIFFERENT bucket: a Voronoi-boundary query whose exact
            # 10-NN straddle buckets
            ca, bucket_a = centers[7]
            b = next(c for c in range(8, N_CLUSTERS)
                     if centers[c][1] != bucket_a)
            cb = centers[b][0]
            q = [(x + y) / 2.0 for x, y in zip(ca, cb)]

        t0 = time.time()
        exact = brute_force_topk(part, "id", "emb", q, k=K).collect()
        t_brute = time.time() - t0
        exact_ids = {r["id"] for r in exact}

        probes = {}
        for n_probe in (1, 2, 4, 8, 16) if hard else (1, 4, 8):
            t0 = time.time()
            got = ivf_topk_trained(
                part, "id", "emb", cents, q, k=K,
                n_probe=n_probe, bucket_col="ivf_bucket",
            ).collect()
            dt = time.time() - t0
            probes[n_probe] = {
                "sec": round(dt, 2),
                "recall": len({r["id"] for r in got} & exact_ids) / K,
            }
        # the recall knob must be monotone; the planted-geometry recall
        # floor only binds when clusters are separated (noise <= 0.5) —
        # in hard mode sub-1.0 recall at low probes IS the measurement
        rs = [probes[p]["recall"] for p in sorted(probes)]
        assert rs == sorted(rs), rs
        if not hard:
            assert probes[8]["recall"] >= 0.9, probes
        print(json.dumps({
            "n_vectors": n,
            "noise": noise,
            "query_mode": query_mode,
            "dim": DIM,
            "k_ivf": K_IVF,
            "cpus": cpus,
            "train_sec": round(t_train, 1),
            "train_rows": sample.count(),
            "assign_write_sec": round(t_assign, 1),
            "brute_force_sec": round(t_brute, 2),
            "probe": {str(k): v for k, v in probes.items()},
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
