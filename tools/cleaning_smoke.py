"""Cleaning-ops scale smoke: PII stats/redaction, Gopher repetition
stats, and corpus-level boilerplate removal at tens of millions of
documents — the same treatment the dedup/ANN pipeline got in
tools/dedup_smoke.py.

The corpus is synthesized deterministically in pure Catalyst with
KNOWN cleaning structure so every claim is asserted in closed form:

- every doc: two 8-token lines of per-doc pseudo-random [a-z0-9]+
  tokens (md5-derived, so cross-doc collisions are impossible in
  practice);
- ``id % 7 == 0``: the first line repeats → exactly these docs have
  ``dup_line_frac > 0``;
- ``id % 10 < 3``: one of 20 fixed boilerplate lines is appended,
  variant ``(id // 10) % 20`` → each variant occurs in exactly
  ``3·N/200`` documents (N is forced to a multiple of 200·7·1000);
- ``id % 1000 == 0``: a PII line (unique email + fixed SSN) →
  exactly ``N/1000`` docs have ``has_pii``; after ``pii_redact`` the
  re-scan must find zero.

Usage: python tools/cleaning_smoke.py [n_docs]   (default 40_000_000)
Prints one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from lucene_spark.ops.cleaning import (  # noqa: E402
    boilerplate_lines,
    gopher_repetition_filter,
    pii_redact,
    pii_stats,
    remove_boilerplate,
    repetition_stats,
)
from lucene_spark.session import get_spark  # noqa: E402

N_BP_VARIANTS = 20
BP_MIN_DOCS = 1000
MODULUS = 200 * 7 * 1000  # forces every closed form below to be exact


def _tok(seed: F.Column) -> F.Column:
    return F.concat(F.lit("w"), F.substring(F.md5(seed), 1, 6))


def _line(seed: F.Column, n_toks: int) -> F.Column:
    return F.concat_ws(
        " ", *[_tok(F.concat(seed, F.lit(f"_{i}"))) for i in range(n_toks)]
    )


def synth_corpus(spark, n_docs: int) -> DataFrame:
    sid = F.col("id").cast("string")
    l1 = _line(F.concat(sid, F.lit("a")), 8)
    l2 = _line(F.concat(sid, F.lit("b")), 8)
    dup = F.when(F.col("id") % 7 == 0, F.concat(F.lit("\n"), l1)).otherwise(
        F.lit("")
    )
    bp_variant = (F.col("id") / 10).cast("long") % N_BP_VARIANTS
    bp = F.when(
        F.col("id") % 10 < 3,
        F.concat(
            F.lit("\nThis transcript is provided under standard terms variant "),
            bp_variant.cast("string"),
        ),
    ).otherwise(F.lit(""))
    pii = F.when(
        F.col("id") % 1000 == 0,
        F.concat(
            F.lit("\ncontact agent"),
            sid,
            F.lit("@example.com ssn 123-45-6789"),
        ),
    ).otherwise(F.lit(""))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(l1, F.lit("\n"), l2, dup, bp, pii).alias("text"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    n_docs -= n_docs % MODULUS
    assert n_docs > 0, f"n_docs must be >= {MODULUS}"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="cleaning_smoke", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_corpus(spark, n_docs)

    # --- PII detect --------------------------------------------------
    t0 = time.time()
    n_pii = pii_stats(docs, "doc_id", "text").where("has_pii").count()
    t_pii = time.time() - t0
    assert n_pii == n_docs // 1000, (n_pii, n_docs // 1000)

    # --- PII redact, then re-scan: masking must be total -------------
    t0 = time.time()
    red = pii_redact(docs, "text")
    n_after = pii_stats(red, "doc_id", "text").where("has_pii").count()
    t_redact = time.time() - t0
    assert n_after == 0, n_after

    # --- repetition stats (full compute forced via aggregates) -------
    t0 = time.time()
    rep = repetition_stats(docs, "doc_id", "text")
    agg = rep.agg(
        F.count(F.when(F.col("dup_line_frac") > 0, 1)).alias("n_dup"),
        F.avg("top2gram_char_frac").alias("avg_t2"),
        F.max("n_lines").alias("max_lines"),
    ).collect()[0]
    t_rep = time.time() - t0
    assert agg["n_dup"] == n_docs // 7, (agg["n_dup"], n_docs // 7)
    assert agg["max_lines"] <= 5

    # --- Gopher filter keep-rate (measured, not asserted: thresholds
    # interact across the synthetic classes; per-value exactness is
    # pinned by tests/test_cleaning.py's Python re-derivation) --------
    t0 = time.time()
    n_keep = gopher_repetition_filter(docs, "doc_id", "text").where("keep").count()
    t_gopher = time.time() - t0

    # --- boilerplate dictionary --------------------------------------
    t0 = time.time()
    bp = boilerplate_lines(docs, "doc_id", "text", min_docs=BP_MIN_DOCS)
    bp_rows = bp.collect()
    t_bp = time.time() - t0
    per_variant = 3 * n_docs // 200
    assert len(bp_rows) == N_BP_VARIANTS, len(bp_rows)
    assert all(r["n_docs"] == per_variant for r in bp_rows), bp_rows[:3]

    # --- removal: cleaned corpus has zero boilerplate, all docs kept -
    # (sum(length(text)) — NOT count(): Catalyst knows the reassembly
    # groupBy yields unique ids and ELIMINATES the preserve-all-docs
    # left join from a bare count, which would time an empty plan)
    t0 = time.time()
    cleaned = remove_boilerplate(docs, "doc_id", "text", min_docs=BP_MIN_DOCS)
    row = cleaned.agg(
        F.count("*").alias("n"), F.sum(F.length("text")).alias("chars")
    ).collect()[0]
    t_remove = time.time() - t0
    n_cleaned, clean_chars = row["n"], row["chars"]
    assert n_cleaned == n_docs, (n_cleaned, n_docs)
    n_bp_after = boilerplate_lines(
        cleaned, "id", "text", min_docs=BP_MIN_DOCS
    ).count()
    assert n_bp_after == 0, n_bp_after

    out = {
        "metric": "cleaning_ops_smoke",
        "n_docs": n_docs,
        "cpus": cpus,
        "pii_scan_sec": round(t_pii, 1),
        "pii_redact_rescan_sec": round(t_redact, 1),
        "repetition_stats_sec": round(t_rep, 1),
        "gopher_filter_sec": round(t_gopher, 1),
        "gopher_keep": n_keep,
        "gopher_keep_frac": round(n_keep / n_docs, 4),
        "boilerplate_dict_sec": round(t_bp, 1),
        "remove_boilerplate_sec": round(t_remove, 1),
        "clean_chars": int(clean_chars),
        "pii_docs": n_pii,
        "bp_variants": len(bp_rows),
        "bp_docs_per_variant": per_variant,
        "all_asserts": "green",
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
