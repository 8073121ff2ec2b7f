"""Dedup-pipeline scale smoke: MinHash LSH → connected components →
keep-canonical → contamination at tens of millions of documents.

The search half of the engine has a 149M-turn proof; this gives the
LLM-data-pipeline half the same treatment (round-4 verdict #2). The
corpus is synthesized deterministically in pure Catalyst with KNOWN
duplicate structure, so recovery is asserted analytically:

- ``N_FAM_EXACT`` families whose members are byte-identical (Jaccard 1)
- ``N_FAM_NEAR`` families where each member = the family's base tokens
  plus ONE member-unique token (Jaccard = (T-2)/T ≈ 0.9 at T=20
  shingles) — exercises the probabilistic LSH recall path
- everything else: per-doc pseudo-random tokens (Jaccard ≈ 0 across
  docs; 16^6-token space makes accidental 3-shingle collisions
  impossible in practice)

Family size = N / 5000 (8000 at the default 40M), far above any sane
``max_bucket_size`` — so the hot-bucket star cap (ops/dedup.py) is on
the hot path, exactly the skew this smoke exists to measure. The
bucket-size histogram (lsh_bucket_stats) is printed as the skew table
for BASELINE §9.

Usage: python tools/dedup_smoke.py [n_docs]   (default 40_000_000)
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from lucene_spark.ops.dedup import (  # noqa: E402
    connected_components,
    contamination_flags,
    dedup_keep_canonical,
    lsh_bucket_stats,
    minhash_lsh_pairs,
)
from lucene_spark.session import get_spark  # noqa: E402

N_FAMILIES = 5000        # id % N_FAMILIES = family; family size = N / 5000
N_FAM_EXACT = 400        # families 0..399: byte-identical members
N_FAM_NEAR = 100         # families 400..499: one unique token per member
N_TOKENS = 20            # base tokens per doc
MAX_BUCKET = 64          # LSH star-cap under test
N_BENCH_EXACT = 50       # bench docs drawn from exact families 0..49
N_BENCH_UNIQUE = 50      # bench docs drawn from unique docs (fam 600..649)


def _tok(seed: F.Column) -> F.Column:
    """A [a-z0-9]+ token from an md5 of the seed expression."""
    return F.concat(F.lit("w"), F.substring(F.md5(seed), 1, 6))


def synth_corpus(spark, n_docs: int) -> DataFrame:
    """(doc_id, text) with the duplicate structure documented above."""
    fam = F.col("id") % N_FAMILIES
    base_seed = F.when(fam < N_FAM_EXACT + N_FAM_NEAR, fam.cast("string")).otherwise(
        F.col("id").cast("string")
    )
    toks = [
        _tok(F.concat(base_seed, F.lit(f"_{i}"))) for i in range(N_TOKENS)
    ]
    # near-dup families: one member-unique trailing token (J ≈ 0.9)
    near_extra = F.when(
        (fam >= N_FAM_EXACT) & (fam < N_FAM_EXACT + N_FAM_NEAR),
        F.concat(F.lit(" "), _tok(F.concat(F.lit("u"), F.col("id").cast("string")))),
    ).otherwise(F.lit(""))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.concat_ws(" ", *toks), near_extra).alias("text"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dedup_smoke", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    fam_size = n_docs // N_FAMILIES
    docs = synth_corpus(spark, n_docs)

    # --- skew table: the measurement max_bucket_size is sized from ----
    t0 = time.time()
    skew = [r.asDict() for r in lsh_bucket_stats(docs, "doc_id", "text").limit(12).collect()]
    t_skew = time.time() - t0

    # --- pairs with the star cap on the hot path ----------------------
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_bucket_size=MAX_BUCKET
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    # --- components + canonical dedup ---------------------------------
    t0 = time.time()
    comp = connected_components(pairs).persist()
    n_clustered_docs = comp.count()
    t_comp = time.time() - t0
    clusters = (
        comp.groupBy("cluster_id").agg(F.count("*").alias("sz")).persist()
    )
    # exact families must come back as exactly N_FAM_EXACT clusters of
    # fam_size (star + one propagation round recovers the full clique)
    exact_member = comp.where(
        (F.col("id") % N_FAMILIES) < N_FAM_EXACT
    )
    n_exact_docs = exact_member.count()
    n_exact_clusters = exact_member.select("cluster_id").distinct().count()
    assert n_exact_docs == N_FAM_EXACT * fam_size, (
        f"every exact-dup member must be clustered: {n_exact_docs} != "
        f"{N_FAM_EXACT * fam_size}"
    )
    assert n_exact_clusters == N_FAM_EXACT, (
        f"exact families must be one cluster each: {n_exact_clusters}"
    )
    # near families: LSH recall at J≈0.9 — a member misses the family's
    # canonical bucket in all 4 bands with p≈(1-0.9^4)^4≈1.4%, so bound
    # loosely and REPORT the measured recall instead of asserting it
    near_member = comp.where(
        ((F.col("id") % N_FAMILIES) >= N_FAM_EXACT)
        & ((F.col("id") % N_FAMILIES) < N_FAM_EXACT + N_FAM_NEAR)
    )
    n_near_docs = near_member.count()
    n_near_clusters = near_member.select("cluster_id").distinct().count()
    near_recall = n_near_docs / (N_FAM_NEAR * fam_size)
    assert near_recall >= 0.95, f"near-dup recall collapsed: {near_recall}"
    # no false merges: unique docs must never appear in any component
    n_false = comp.where((F.col("id") % N_FAMILIES) >= N_FAM_EXACT + N_FAM_NEAR).count()
    assert n_false == 0, f"{n_false} unique docs were clustered (false positives)"

    t0 = time.time()
    n_kept = dedup_keep_canonical(docs, pairs, id_col="doc_id").count()
    t_dedup = time.time() - t0
    # kept = uniques + near-dup stragglers + one canonical per cluster
    n_total_clusters = clusters.count()
    expected_kept = n_docs - n_clustered_docs + n_total_clusters
    assert n_kept == expected_kept, (n_kept, expected_kept)

    # --- contamination vs a broadcast bench set -----------------------
    bench = (
        spark.range(N_BENCH_EXACT)
        .select(F.col("id").alias("bench_id"),
                F.col("id").alias("src_doc"))
        .unionByName(
            # mid-replica unique docs — relative to fam_size so the
            # source ids exist at every n_docs
            spark.range(N_BENCH_UNIQUE).select(
                (F.col("id") + N_BENCH_EXACT).alias("bench_id"),
                (F.lit((fam_size // 2) * N_FAMILIES) + 600 + F.col("id")).alias("src_doc"),
            )
        )
    )
    bench_docs = docs.withColumnRenamed("doc_id", "src_doc").join(
        F.broadcast(bench), "src_doc"
    ).select("bench_id", "text")
    t0 = time.time()
    flags = contamination_flags(
        docs, bench_docs, "doc_id", "text", "bench_id", "text"
    ).where(F.col("contaminated"))
    n_contam = flags.count()
    t_contam = time.time() - t0
    # every member of exact families 0..49 + the 50 unique source docs
    expected_contam = N_BENCH_EXACT * fam_size + N_BENCH_UNIQUE
    assert n_contam == expected_contam, (n_contam, expected_contam)

    print(json.dumps({
        "n_docs": n_docs,
        "fam_size": fam_size,
        "cpus": cpus,
        "max_bucket_size": MAX_BUCKET,
        "skew_table_sec": round(t_skew, 1),
        "skew_top": skew,
        "lsh_pairs_sec": round(t_pairs, 1),
        "n_pairs": n_pairs,
        "components_sec": round(t_comp, 1),
        "n_clustered_docs": n_clustered_docs,
        "n_clusters": n_total_clusters,
        "n_exact_clusters": n_exact_clusters,
        "near_dup_recall": round(near_recall, 4),
        "n_near_clusters": n_near_clusters,
        "dedup_sec": round(t_dedup, 1),
        "n_kept": n_kept,
        "contamination_sec": round(t_contam, 1),
        "n_contaminated": n_contam,
        "pipeline_docs_per_sec": round(
            n_docs / (t_pairs + t_comp + t_dedup)
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
