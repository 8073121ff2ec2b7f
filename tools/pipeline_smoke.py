"""End-to-end training-data pipeline capstone: every major subsystem of
the engine composed over ONE corpus, with closed-form asserts at every
stage and planted "needle" terms whose final searchability proves the
pipeline's set algebra end to end.

    raw transcripts
      → sessionize                (gap sessions, closed-form per row)
      → pii_redact                (emails scrubbed; a needle HIDDEN in
                                   the email must become unsearchable)
      → remove_boilerplate        (shared lines stripped; dup-family
                                   lines below min_docs survive)
      → token-count filter        (junk turns dropped)
      → span dedup                (exact-substring: a shared 20-token
                                   disclaimer stripped everywhere but
                                   its global-first doc; k=19 provably
                                   can't touch the ≤18-token families)
      → MinHash LSH dedup         (identical families → one canonical,
                                   bucket-skew cap on, zero false merges)
      → lang_id_ngram             (labels the surviving canonicals)
      → build_index + search      (the needles come out EXACTLY where
                                   the set algebra says they must)

The corpus is synthesized in pure Catalyst from the doc id alone, so
every stage's output has a closed form (n must be a multiple of
20,000). With classes keyed by id % 20:

  class 19          "junk":   text is one shared 3-token line — stripped
                              as boilerplate, then dropped by the token
                              filter (never reaches the index).
  class 18          "pii":    20 unique hash tokens + an email whose
                              local part is the needle term
                              ``zephyrquill@example.com`` — redaction
                              must make the needle unsearchable.
  classes 15-17     "dup":    F=500 identical-text families (fam =
                              (id//20) % F, 3n/(20F) members each); the
                              text is 16 words hash-picked from a
                              Spanish (fam%10==3) or English vocabulary
                              — trigram lang-ID reads it, but families
                              share no 3-shingles so LSH buckets never
                              mix; family 7 carries the needle term (no
                              phrase) — dedup must leave EXACTLY ONE
                              searchable copy (id 155).
  classes 0-14      "unique": 20 hash tokens from a 2^64 space; ids
                              with id%20==5 and (id//20)%1000==0 also
                              carry the needle phrase
                              "amber kite floats zephyrquill ..." and
                              must ALL surface; ids with id%20==6 and
                              (id//20)%500==0 append the shared
                              20-token DISCLAIMER (needle: quillnova)
                              that span dedup strips keep-first.

Orthogonally, ids with id%10 < 3 (all in the unique class) prepend a
shared newsletter line: boilerplate_lines must find exactly {newsletter,
junk} and nothing else (family lines sit below min_docs = n/100).

Sessions: conv = id//100, turn = id%100, ts = 60_000·turn +
1_000_000·(turn div 10) ⇒ session_idx(turn) = turn div 10 on every row.

Expected search results over the final index (default field ``text``):

  text:zephyrquill            → the 200·(n/4M) surviving unique needles
                                ∪ {155} (family-7 canonical)
  text:"amber kite floats"    → the unique needles only
  +zephyrquill -amber         → exactly {155}
  text:quillnova              → exactly {6} (the kept disclaimer copy;
                                ids ≡ 6 mod 10,000 carried it going in)

Usage: python tools/pipeline_smoke.py [n]     (default 4_000_000)
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

from lucene_spark.analysis import Analyzer  # noqa: E402
from lucene_spark.index.builder import IndexConfig, build_index  # noqa: E402
from lucene_spark.ops.cleaning import (  # noqa: E402
    boilerplate_lines,
    pii_redact,
    pii_stats,
    remove_boilerplate,
)
from lucene_spark.ops.dedup import (  # noqa: E402
    connected_components,
    dedup_keep_canonical,
    minhash_lsh_pairs,
)
from lucene_spark.ops.spans import (  # noqa: E402
    duplicated_span_stats,
    remove_duplicated_spans,
)
from lucene_spark.ops.textstats import lang_id_ngram, token_counts  # noqa: E402
from lucene_spark.search.executor import SparkSearcher  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402
from lucene_spark.streaming.sessionize import sessionize  # noqa: E402

N_FAMILIES = 500
TURNS_PER_CONV = 100
TURNS_PER_SESS = 10
STEP_MS = 60_000
PAUSE_MS = 1_000_000
GAP_MS = 90_000

NEWSLETTER = "subscribe to our newsletter today for exclusive updates"
JUNK_LINE = "filler filler filler"
# A 20-token disclaimer paragraph (needle: quillnova) appended to ids
# ≡ 6 (mod 10,000) — the exact-substring span-dedup stage must strip
# every copy but the global first (doc 6). SPAN_K = 19 sits ABOVE the
# family texts' ≤18 tokens, so span dedup provably cannot touch the
# LSH stage's duplicate families; the disclaimer (20 tokens ≥ k) is
# the only duplicated window source in the whole corpus.
DISCLAIMER = (
    "this content is provided under the standard corpus license "
    "agreement quillnova revision four all rights reserved by the "
    "publisher inc"
)
SPAN_K = 19
# Family texts are 16 words hash-picked from a per-language vocabulary:
# char-trigram language ID is word-order-blind, so a "word salad" still
# classifies, while the 3-shingle sets of two families are disjoint with
# overwhelming probability (P[shared shingle] ~ 14^2/40^3) — families
# must NOT share shingles or LSH buckets mix and the star guard's
# foreign hubs eat their pairs (the documented hot-bucket trade-off).
ES_VOCAB = (
    "la casa del gato esta cerca del rio y toda familia canta canciones "
    "cada manana antes de salir para que los ninos puedan ver el cielo "
    "azul sobre las montanas durante este tiempo nuevo con mucha alegria "
    "siempre"
).split()
EN_VOCAB = (
    "the server restarts every request and people walk to market each "
    "morning before work begins with their friends because they want "
    "some fresh bread from old town square where children play during "
    "long summer days happily"
).split()
NEEDLE_SUFFIX = "amber kite floats zephyrquill over the quiet valley"


def synth(spark, n: int) -> DataFrame:
    """input_hint-shaped transcripts with closed-form pipeline structure."""
    oid = F.col("id")
    cls = oid % 20
    fam = (oid / 20).cast("long") % N_FAMILIES
    hash_toks = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(
                F.lit("t"), F.hex(F.xxhash64(oid * 31 + j, F.lit("pipe")))
            ),
        ),
    )
    is_needle = (cls == 5) & (((oid / 20).cast("long") % 1000) == 0)
    body = (
        F.when(cls == 19, F.lit(JUNK_LINE))
        .when(
            cls == 18,
            F.concat(
                hash_toks, F.lit(" contact zephyrquill@example.com today")
            ),
        )
        .when(
            cls >= 15,
            F.concat(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(15)),
                        lambda i: F.when(
                            fam % 10 == 3,
                            F.element_at(
                                F.array(*[F.lit(w) for w in ES_VOCAB]),
                                (
                                    F.pmod(
                                        F.xxhash64(fam * 37 + i, F.lit("w")),
                                        F.lit(len(ES_VOCAB)),
                                    )
                                    + 1
                                ).cast("int"),
                            ),
                        ).otherwise(
                            F.element_at(
                                F.array(*[F.lit(w) for w in EN_VOCAB]),
                                (
                                    F.pmod(
                                        F.xxhash64(fam * 37 + i, F.lit("w")),
                                        F.lit(len(EN_VOCAB)),
                                    )
                                    + 1
                                ).cast("int"),
                            ),
                        ),
                    ),
                ),
                F.when(fam == 7, F.lit(" zephyrquill")).otherwise(F.lit("")),
                F.lit(" familia"),
                fam.cast("string"),
            ),
        )
        .when(is_needle, F.concat(hash_toks, F.lit(" " + NEEDLE_SUFFIX)))
        .when(
            (cls == 6) & (((oid / 20).cast("long") % 500) == 0),
            F.concat(hash_toks, F.lit(" " + DISCLAIMER)),
        )
        .otherwise(hash_toks)
    )
    text = F.when(
        (oid % 10) < 3, F.concat(F.lit(NEWSLETTER + "\n"), body)
    ).otherwise(body)
    turn = (oid % TURNS_PER_CONV).cast("long")
    return spark.range(n).select(
        oid.alias("oid"),
        F.concat(F.lit("c"), (oid / TURNS_PER_CONV).cast("long").cast("string")).alias(
            "conv_id"
        ),
        turn.cast("int").alias("turn_idx"),
        F.when(turn % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias(
            "role"
        ),
        F.lit(None).cast("string").alias("tool"),
        (
            F.lit(STEP_MS) * turn
            + F.lit(PAUSE_MS) * (turn / TURNS_PER_SESS).cast("long")
        ).alias("ts"),
        text.alias("text"),
    )


def run_pipeline(spark, n: int, index_dir: str) -> dict:
    """Run every stage with closed-form asserts; returns the metrics
    dict. Raises AssertionError on ANY deviation from the closed forms
    — callers (the CLI below, tests/test_pipeline_compose.py) only see
    numbers that are all parity-verified."""
    assert n % 20_000 == 0, "n must be a multiple of 20,000 for exact counts"
    out: dict = {"n": n, "stages": {}, "queries": {}}
    members = 3 * n // (20 * N_FAMILIES)
    n_needles = n // 20_000
    fam7_canonical = 7 * 20 + 15  # min id of family 7 = 155

    raw = synth(spark, n).persist()
    raw.count()

    # ---- 1. sessionize (session structure is a property of the raw log)
    t0 = time.time()
    sess = sessionize(raw, "conv_id", "ts", GAP_MS, order_cols=["turn_idx"])
    bad = sess.where(
        (F.col("session_idx") != (F.col("turn_idx") / TURNS_PER_SESS).cast("long"))
        | (
            F.col("session_start_ms")
            != (
                F.lit(STEP_MS) * ((F.col("turn_idx") / TURNS_PER_SESS).cast("long") * TURNS_PER_SESS)
                + F.lit(PAUSE_MS) * (F.col("turn_idx") / TURNS_PER_SESS).cast("long")
            )
        )
    ).count()
    out["stages"]["sessionize"] = round(time.time() - t0, 1)
    assert bad == 0, f"sessionize: {bad} rows off the closed form"

    # ---- 2. PII redaction (the needle inside the email must die here)
    t0 = time.time()
    docs = raw.select("oid", "text")
    n_pii = (
        pii_stats(docs, "oid", "text").where(F.col("has_pii")).count()
    )
    red = pii_redact(docs, "text").persist()
    n_pii_after = (
        pii_stats(red, "oid", "text").where(F.col("has_pii")).count()
    )
    out["stages"]["pii_redact"] = round(time.time() - t0, 1)
    assert n_pii == n // 20, f"expected {n // 20} PII docs, found {n_pii}"
    assert n_pii_after == 0, f"{n_pii_after} PII docs survived redaction"

    # ---- 3. boilerplate removal (dictionary must be EXACTLY 2 lines)
    t0 = time.time()
    bp = boilerplate_lines(red, "oid", "text", min_docs=n // 100).persist()
    bp_lines = sorted(r["line"] for r in bp.select("line").collect())
    cleaned = remove_boilerplate(
        red, "oid", "text", min_docs=n // 100, boilerplate=bp
    ).persist()
    n_cleaned = cleaned.count()
    leaked = cleaned.where(F.col("text").contains(NEWSLETTER)).count()
    out["stages"]["remove_boilerplate"] = round(time.time() - t0, 1)
    assert bp_lines == sorted([NEWSLETTER, JUNK_LINE]), bp_lines
    assert n_cleaned == n, "remove_boilerplate must preserve every doc"
    assert leaked == 0, f"{leaked} docs still carry the newsletter line"
    red.unpersist()

    # ---- 4. token-count quality filter (junk turns out, nothing else)
    t0 = time.time()
    keep_ids = (
        token_counts(cleaned, "id", "text")
        .where(F.col("n_ws") >= 10)
        .select("id")
    )
    kept = cleaned.join(keep_ids, "id").persist()
    n_kept = kept.count()
    out["stages"]["token_filter"] = round(time.time() - t0, 1)
    assert n_kept == n - n // 20, f"kept {n_kept}, expected {n - n // 20}"
    cleaned.unpersist()

    # ---- 5. exact-substring span dedup (disclaimer → one kept copy)
    t0 = time.time()
    m_disc = n // 10_000  # docs carrying the 20-token disclaimer
    exp_dup = m_disc if m_disc >= 2 else 0
    sp = duplicated_span_stats(kept, "id", "text", k=SPAN_K).agg(
        F.count(F.when(F.col("dup_tokens") > 0, 1)).alias("d"),
        F.coalesce(F.sum("dup_tokens"), F.lit(0)).alias("s"),
        F.coalesce(F.sum("n_spans"), F.lit(0)).alias("sp"),
    ).collect()[0]
    assert sp["d"] == exp_dup, f"span-dup docs {sp['d']}, expected {exp_dup}"
    assert sp["s"] == 20 * exp_dup, f"covered tokens {sp['s']}"
    assert sp["sp"] == exp_dup, f"span count {sp['sp']}"
    despanned = (
        remove_duplicated_spans(kept, "id", "text", k=SPAN_K)
        .select("id", F.col("clean_text").alias("text"), "removed_tokens")
        .persist()
    )
    n_desp = despanned.count()
    removed = despanned.agg(F.sum("removed_tokens")).collect()[0][0]
    out["stages"]["span_dedup"] = round(time.time() - t0, 1)
    assert n_desp == n_kept, "span removal must preserve every doc"
    exp_removed = 20 * (m_disc - 1) if m_disc >= 2 else 0
    assert removed == exp_removed, f"removed {removed}, expected {exp_removed}"
    despanned = despanned.drop("removed_tokens")
    kept.unpersist()

    # ---- 6. MinHash LSH dedup (families → exactly one canonical each)
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        despanned, "id", "text", threshold=0.9, max_bucket_size=64
    ).persist()
    comps = connected_components(pairs).persist()
    sizes = {
        r["sz"]: r["cnt"]
        for r in comps.groupBy("cluster_id")
        .count()
        .withColumnRenamed("count", "sz")
        .groupBy("sz")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    stray = comps.where(~(F.col("id") % 20).isin(15, 16, 17)).count()
    survivors = dedup_keep_canonical(despanned, pairs, "id").persist()
    n_surv = survivors.count()
    out["stages"]["minhash_dedup"] = round(time.time() - t0, 1)
    assert sizes == {members: N_FAMILIES}, f"component sizes: {sizes}"
    assert stray == 0, f"{stray} non-dup-class docs were merged (false merge)"
    assert n_surv == 4 * n // 5 + N_FAMILIES, n_surv
    pairs.unpersist()
    comps.unpersist()
    despanned.unpersist()

    # ---- 7. language ID over the surviving family canonicals
    t0 = time.time()
    canon = survivors.where((F.col("id") % 20).isin(15, 16, 17))
    labels = {
        r["id"]: r["lang"]
        for r in lang_id_ngram(canon, "id", "text").collect()
    }
    out["stages"]["lang_id"] = round(time.time() - t0, 1)
    assert len(labels) == N_FAMILIES
    # a statistical classifier has no closed form on 16-word salads —
    # hold it to the §9.3 quality bar (>=0.9 per group) and report the
    # exact, deterministic counts (measured: es 47/50, en 443/450; the
    # misses go to it/de/fr, the adjacent-language confusions §9.3
    # documents for short inputs)
    es_fams = {20 * f + 15 for f in range(N_FAMILIES) if f % 10 == 3}
    es_acc = sum(labels[i] == "es" for i in es_fams) / len(es_fams)
    en_acc = sum(
        labels[i] == "en" for i in labels if i not in es_fams
    ) / (N_FAMILIES - len(es_fams))
    out["lang_acc"] = {"es": round(es_acc, 3), "en": round(en_acc, 3)}
    assert es_acc >= 0.9, f"es accuracy {es_acc} below the 0.9 bar"
    assert en_acc >= 0.9, f"en accuracy {en_acc} below the 0.9 bar"

    # ---- 8. index the training set, search the needles
    t0 = time.time()
    training = survivors.withColumnRenamed("id", "oid").join(
        raw.select("oid", "conv_id", "turn_idx", "role", "tool", "ts"),
        "oid",
    )
    cfg = IndexConfig(
        field_policy={
            "text": "text",
            "conv_id": "keyword",
            "role": "keyword",
        },
        analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="pipe"),
        seg_size=16384,
        segments_per_commit=1024,
    )
    ix = build_index(
        spark, training, index_dir, cfg, order_cols=["conv_id", "turn_idx"]
    )
    out["stages"]["build_index"] = round(time.time() - t0, 1)
    out["build_timings"] = ix.stats.get("build_timings_sec")
    s = SparkSearcher(ix)
    ix.set_default_search_field("text")

    def hit_oids(q: str, k: int = 1000) -> tuple[set, float]:
        t0 = time.time()
        hits = s.search(q, k=k)
        oids = {
            r["oid"]
            for r in hits.join(ix.docs.select("doc_id", "oid"), "doc_id")
            .select("oid")
            .collect()
        }
        return oids, round(time.time() - t0, 2)

    expect_needles = {20_000 * m + 5 for m in range(n_needles)}

    got, out["queries"]["term"] = hit_oids("text:zephyrquill")
    assert got == expect_needles | {fam7_canonical}, (
        f"term needle set off by {got ^ (expect_needles | {fam7_canonical})}"
    )
    got, out["queries"]["phrase"] = hit_oids('text:"amber kite floats"')
    assert got == expect_needles, "phrase must hit the unique needles only"
    got, out["queries"]["not"] = hit_oids("+zephyrquill -amber")
    assert got == {fam7_canonical}, (
        f"NOT query must hit only the family-7 canonical, got {got}"
    )
    got, out["queries"]["disclaimer"] = hit_oids("text:quillnova")
    assert got == {6}, (
        f"span dedup must leave the disclaimer searchable ONLY in the "
        f"global-first doc 6, got {got}"
    )

    survivors.unpersist()
    raw.unpersist()
    out["metric"] = "pipeline_end_to_end"
    out["value"] = round(sum(out["stages"].values()), 1)
    out["unit"] = "sec"
    out["docs_per_sec"] = round(n / out["value"], 1)
    out["n_survivors"] = n_surv
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="pipeline_smoke",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="pipeline_smoke_")
    try:
        out = run_pipeline(spark, n, d)
        out["cpus"] = cpus
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
