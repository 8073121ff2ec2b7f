"""Cleaning ops: PII redaction, Gopher repetition stats, boilerplate
removal. Expected values are computed by an independent pure-Python
re-derivation (same definitions, different machinery) so the Catalyst
higher-order folds are checked value-exactly.

Reference anchor: the reference engine has no cleaning surface — these
are LLM-data-pipeline ops per the brief (Gopher thresholds: Rae et al.
2021 table A1; line-level boilerplate: C4/RefinedWeb).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from lucene_spark.ops.cleaning import (
    GOPHER_THRESHOLDS,
    PII_PATTERNS,
    PII_TOKENS,
    boilerplate_lines,
    gopher_repetition_filter,
    pii_redact,
    pii_stats,
    remove_boilerplate,
    repetition_stats,
)

TOK = re.compile(r"[a-z0-9]+")


# ------------------------------------------------ python re-derivation


LINE_TRIM = " \t\r\x0b\x0c"  # the engine's ASCII line-trim charset


def py_repetition(text: str) -> dict:
    lines = [
        l.strip(LINE_TRIM) for l in text.split("\n") if l.strip(LINE_TRIM)
    ]
    toks = TOK.findall(text.lower())
    n = len(lines)
    cnt = Counter(lines)
    dup_occ = n - len(cnt)
    line_chars = sum(len(l) for l in lines)
    dup_chars = sum(len(l) for l in lines if cnt[l] > 1)
    tok_chars = sum(len(t) for t in toks)

    def gram_frac(k: int) -> float:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not grams or not tok_chars:
            return 0.0
        best = Counter(grams).most_common()
        top_n = best[0][1]
        # tie-break to the smallest gram string (sorted-run semantics)
        top_g = min(g for g, c in best if c == top_n)
        frac = top_n * (len(top_g) - (k - 1)) / tok_chars
        return min(frac, 1.0)

    def line_frac(pred) -> float:
        return sum(1 for l in lines if pred(l)) / n if n else 0.0

    return {
        "n_lines": n,
        "dup_line_frac": round(dup_occ / n, 6) if n else 0.0,
        "dup_line_char_frac": round(dup_chars / line_chars, 6)
        if line_chars
        else 0.0,
        "top2gram_char_frac": round(gram_frac(2), 6),
        "top3gram_char_frac": round(gram_frac(3), 6),
        "bullet_line_frac": round(
            line_frac(lambda l: re.search(r"^[-*•‣▪●·]", l) is not None), 6
        ),
        "ellipsis_line_frac": round(
            line_frac(lambda l: l.endswith(("...", "…"))), 6
        ),
    }


CORPUS = [
    (1, "Contact bob@example.com or 555-867-5309\nVisit 192.168.0.1\n"
        "SSN 123-45-6789 card 4111 1111 1111 1111"),
    (2, "hello world\nhello world\nunique line\n\n   \nhello world"),
    (3, ""),
    (4, "- bullet one\n- bullet two\nplain...\nplain..."),
    (5, "spam spam spam spam spam eggs"),
    (6, "a normal paragraph about spark and indexes\nwith two lines"),
    (7, "x y x y x y x y"),
    # adversarial shapes: whitespace-only, newline runs, unicode,
    # digit runs that tile several PII classes, ellipsis/bullet glyphs
    (8, "\n\n\n"),
    (9, "   \n\t \n  "),
    (10, "héllo wörld\n… and more…\n• unicode bullet"),
    (11, "1.2.3.4.5.6.7.8 and 123-45-6789-1234 and 12-34-5678"),
    (12, "555-123-4567 or (555) 123-4567 or +1 555 123 4567"),
    (13, "word " * 200),
    (14, "same line\n" * 40),
    (15, "...\n...\n- \n-"),
    # U+2028 after the ellipsis: endswith (all three engines) says no;
    # a '$'-anchored Java regex would have said yes — parity guard
    (16, "wait… \nnormal line"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


class TestRepetitionStats:
    def test_matches_python_rederivation(self, spark, corpus):
        got = {r["id"]: r.asDict() for r in
               repetition_stats(corpus, "doc_id", "text").collect()}
        for doc_id, text in CORPUS:
            exp = py_repetition(text)
            for k, v in exp.items():
                assert got[doc_id][k] == pytest.approx(v, abs=1e-6), (
                    doc_id, k, got[doc_id][k], v)

    def test_gopher_filter_flags(self, spark, corpus):
        flags = {r["id"]: r["keep"] for r in
                 gopher_repetition_filter(corpus, "doc_id", "text").collect()}
        for doc_id, text in CORPUS:
            exp = py_repetition(text)
            want = all(exp[k] <= v for k, v in GOPHER_THRESHOLDS.items())
            assert flags[doc_id] == want, (doc_id, exp)
        # the fixture must exercise both outcomes
        assert set(flags.values()) == {True, False}

    def test_gram_frac_capped(self, spark):
        df = spark.createDataFrame(
            [(1, "spam spam spam spam spam")], "doc_id long, text string")
        r = repetition_stats(df, "doc_id", "text").collect()[0]
        assert r["top2gram_char_frac"] == 1.0
        assert r["top3gram_char_frac"] == 1.0


def _fuzz_texts(n: int = 300, seed: int = 7) -> list[tuple[int, str]]:
    """Deterministic nasty-text generator: random mixes of tokens,
    whitespace runs, newlines, unicode, PII fragments, bullets and
    ellipses — one Spark job cross-checks all of them value-exactly."""
    import random

    rng = random.Random(seed)
    atoms = [
        "word", "the", "spark", "x", "1234", "a.b", "…", "...", "- item",
        "• dot", "\t", "   ", "", "héllo", "wörld", "123-45-6789",
        "bob@x.io", "10.0.0.1", "555-123-4567", "4111 1111 1111 1111",
        " ", "\r", "same same same", "a b a b a b",
    ]
    out = []
    for i in range(n):
        n_lines = rng.randint(0, 8)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(0, 6)
            lines.append(" ".join(rng.choice(atoms) for _ in range(k)))
        if lines and rng.random() < 0.4:  # force intra-doc dup lines
            lines.append(rng.choice(lines))
        out.append((i, "\n".join(lines)))
    return out


def test_repetition_fuzz_matches_python(spark):
    rows = _fuzz_texts()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict() for r in
           repetition_stats(df, "doc_id", "text").collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        exp = py_repetition(text)
        for k, v in exp.items():
            assert got[doc_id][k] == pytest.approx(v, abs=1e-6), (
                doc_id, k, got[doc_id][k], v, repr(text))


class TestPii:
    def test_counts(self, spark, corpus):
        got = {r["id"]: r.asDict() for r in
               pii_stats(corpus, "doc_id", "text").collect()}
        for doc_id, text in CORPUS:
            for name, pat in PII_PATTERNS:
                assert got[doc_id][f"n_{name}"] == len(
                    re.findall(pat, text)), (doc_id, name)
            assert got[doc_id]["has_pii"] == bool(
                sum(len(re.findall(p, text)) for _, p in PII_PATTERNS))
        assert got[1]["has_pii"] and not got[2]["has_pii"]

    def test_redaction_masks_in_order(self, spark, corpus):
        got = {r["doc_id"]: r["text"] for r in
               pii_redact(corpus, "text").collect()}
        for doc_id, text in CORPUS:
            exp = text
            for name, pat in PII_PATTERNS:
                exp = re.sub(pat, PII_TOKENS[name], exp)
            assert got[doc_id] == exp, doc_id
        r1 = got[1]
        for token in ("<EMAIL>", "<PHONE>", "<IP>", "<SSN>", "<CREDIT_CARD>"):
            assert token in r1
        assert "bob@example.com" not in r1 and "123-45-6789" not in r1

    def test_redaction_total(self, spark, corpus):
        # masking is total: a re-scan of the redacted corpus finds no
        # PII (replacement tokens never create new matches, and
        # leftovers adjacent to a consumed region can't re-combine)
        red = pii_redact(corpus, "text").withColumnRenamed("doc_id", "id2")
        again = pii_stats(red, "id2", "text")
        assert again.where("has_pii").count() == 0

    def test_email_shields_domain_from_ip(self, spark):
        # after email masking, its digits can't feed an ipv4/phone match
        df = spark.createDataFrame(
            [(1, "mail me: a@10.11.12.13.example.com")],
            "doc_id long, text string")
        out = pii_redact(df, "text").collect()[0]["text"]
        assert out == "mail me: <EMAIL>"


BP_CORPUS = [
    (1, "real content line one\nCookie notice: accept all\nreal content line two"),
    (2, "Cookie notice: accept all\nanother real paragraph\nCopyright 2026 ACME"),
    (3, "Copyright 2026 ACME\nCookie notice: accept all"),
    (4, "totally unique document"),
    (5, ""),
    # duplicate line only WITHIN one doc: array_distinct before the
    # explode means it counts one doc, not two — stays non-boilerplate
    (6, "only here twice\nonly here twice"),
]


class TestBoilerplate:
    def test_dictionary(self, spark):
        df = spark.createDataFrame(BP_CORPUS, "doc_id long, text string")
        bp = {r["line"]: r["n_docs"] for r in
              boilerplate_lines(df, "doc_id", "text", min_docs=2).collect()}
        assert bp == {"Cookie notice: accept all": 3, "Copyright 2026 ACME": 2}

    def test_removal_preserves_order_and_empty_docs(self, spark):
        df = spark.createDataFrame(BP_CORPUS, "doc_id long, text string")
        got = {r["id"]: r["text"] for r in
               remove_boilerplate(df, "doc_id", "text", min_docs=2).collect()}
        assert got[1] == "real content line one\nreal content line two"
        assert got[2] == "another real paragraph"
        assert got[3] == ""          # all lines were boilerplate
        assert got[4] == "totally unique document"
        assert got[5] == ""          # empty doc survives
        assert got[6] == "only here twice\nonly here twice"
        assert len(got) == len(BP_CORPUS)

    def test_precomputed_dictionary_reuse(self, spark):
        df = spark.createDataFrame(BP_CORPUS, "doc_id long, text string")
        bp = boilerplate_lines(df, "doc_id", "text", min_docs=3)
        got = {r["id"]: r["text"] for r in
               remove_boilerplate(df, "doc_id", "text",
                                  boilerplate=bp).collect()}
        # min_docs=3 keeps the Copyright line (df 2)
        assert got[3] == "Copyright 2026 ACME"
        assert got[2] == "another real paragraph\nCopyright 2026 ACME"

    def test_fracs_bounded(self, spark, corpus):
        # every fraction stays in [0,1] on the adversarial shapes
        # (whitespace-only docs, 40× duplicate lines, 200× one token)
        import pyspark.sql.functions as SF

        rep = repetition_stats(corpus, "doc_id", "text")
        frac_cols = [c for c in rep.columns if c.endswith("frac")]
        bad = rep.where(
            " OR ".join(f"({c} < 0 OR {c} > 1)" for c in frac_cols)
        ).count()
        assert bad == 0
        assert rep.where(SF.col("n_lines") < 0).count() == 0

    def test_removal_idempotent(self, spark):
        # cleaning an already-cleaned corpus removes nothing: every
        # surviving line has document frequency < min_docs by
        # construction (per-doc-distinct counting is unaffected by
        # removing OTHER lines)
        df = spark.createDataFrame(BP_CORPUS, "doc_id long, text string")
        once = remove_boilerplate(df, "doc_id", "text", min_docs=2)
        twice = remove_boilerplate(once, "id", "text", min_docs=2)
        a = {r["id"]: r["text"] for r in once.collect()}
        b = {r["id"]: r["text"] for r in twice.collect()}
        assert a == b

    def test_preserves_original_bytes(self, spark):
        # indentation, blank lines and trailing whitespace of surviving
        # lines come back byte-identical; only boilerplate lines leave
        docs = [
            (1, "def f():\n    return 1\n\n  done  \nCookie notice"),
            (2, "Cookie notice\nother"),
            (3, "  Cookie notice  \nthird"),  # trimmed text matches → removed
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["id"]: r["text"] for r in
               remove_boilerplate(df, "doc_id", "text", min_docs=3).collect()}
        assert got[1] == "def f():\n    return 1\n\n  done  "
        assert got[2] == "other"
        assert got[3] == "third"

    def test_no_boilerplate_is_identity(self, spark):
        df = spark.createDataFrame(
            [(1, "  indented\n\nblank kept\n"), (2, "x")],
            "doc_id long, text string")
        got = {r["id"]: r["text"] for r in
               remove_boilerplate(df, "doc_id", "text", min_docs=2).collect()}
        assert got[1] == "  indented\n\nblank kept\n"
        assert got[2] == "x"

    def test_plan_broadcasts_dictionary_when_forced(self, spark):
        df = spark.createDataFrame(BP_CORPUS, "doc_id long, text string")
        plan = remove_boilerplate(
            df, "doc_id", "text", min_docs=2, broadcast_dict=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        # default leaves the strategy to Catalyst/AQE — the dictionary
        # is unbounded at min_docs=2, so no forced broadcast hint
        dflt = remove_boilerplate(df, "doc_id", "text", min_docs=2)._jdf \
            .queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in dflt


def test_cleaning_ops_run_on_streams(spark, tmp_path):
    """pii_redact / pii_stats / repetition_stats are stateless
    projections, so the SAME call works on a streaming DataFrame —
    the ingest-pipeline deployment shape (redact before landing).
    Batch and stream must produce identical rows."""
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    batch = spark.createDataFrame(CORPUS, "doc_id long, text string")
    batch.coalesce(1).write.parquet(os.path.join(src, "p0"))

    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(os.path.join(src, "*"))
    )
    red = pii_redact(stream, "text")
    out = repetition_stats(red, "doc_id", "text").join(
        pii_stats(red, "doc_id", "text").select("id", "has_pii"), "id"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("clean_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["id"]: r for r in spark.sql("SELECT * FROM clean_stream").collect()}
    red_b = pii_redact(batch, "text")
    want_rep = {r["id"]: r for r in
                repetition_stats(red_b, "doc_id", "text").collect()}
    assert len(got) == len(CORPUS)
    for i, r in want_rep.items():
        assert not got[i]["has_pii"]  # redaction happened upstream
        for c in r.asDict():
            assert got[i][c] == r[c], (i, c)


def test_null_text_is_empty_document(spark):
    """NULL text rows behave as empty documents in every op instead of
    propagating NULL through the stats or vanishing from output."""
    df = spark.createDataFrame(
        [(1, None), (2, "real line\nreal line")], "doc_id long, text string")
    r = {x["id"]: x for x in repetition_stats(df, "doc_id", "text").collect()}
    assert r[1]["n_lines"] == 0 and r[1]["dup_line_frac"] == 0.0
    assert r[2]["dup_line_frac"] == 0.5  # (2 lines − 1 distinct) / 2
    p = {x["id"]: x for x in pii_stats(df, "doc_id", "text").collect()}
    assert p[1]["has_pii"] is False and p[1]["n_email"] == 0
    red = {x["doc_id"]: x["text"] for x in pii_redact(df, "text").collect()}
    assert red[1] == ""
    g = {x["id"]: x["keep"] for x in
         gopher_repetition_filter(df, "doc_id", "text").collect()}
    assert g[1] is True  # empty doc trips no repetition threshold
    rb = {x["id"]: x["text"] for x in
          remove_boilerplate(df, "doc_id", "text", min_docs=2).collect()}
    assert rb[1] == "" and rb[2] == "real line\nreal line"
