"""Round-3 regression tests: ADVICE.md fixes (boost convention through
WAND, legacy delta-meta/plan resume, hash_split remainder) and the new
round-3 operators."""

import json
import os

import pytest

from lucene_spark.search.executor import SparkSearcher
from lucene_spark.search.query import MultiTermQuery, Term, TermQuery


# ---------------------------------------------------------- ADVICE #1
# WAND weights are q.boost * idf per unique term; the exact path scores
# idf * partial per leaf and multiplies the aggregate by q.boost — the
# two conventions must agree or pruning='force' changes boosted scores.


def _ranked(searcher, q, pruning, k=25):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in searcher.search(
            q, k=k, score_mode="bm25", pruning=pruning
        ).collect()
    ]


def test_boosted_disjunction_wand_parity(spark_index):
    q = MultiTermQuery(
        [Term("spark", "text"), Term("index", "text")], [None, None]
    )
    q.boost = 2.5
    s = SparkSearcher(spark_index)
    exact = _ranked(s, q, "off")
    pruned = _ranked(s, q, "force")
    assert [e[0] for e in exact] == [p[0] for p in pruned]
    for e, p in zip(exact, pruned):
        assert e[1] == pytest.approx(p[1], abs=1e-9)


def test_boosted_term_wand_parity(spark_index):
    q = TermQuery(Term("spark", "text"))
    q.boost = 3.0
    s = SparkSearcher(spark_index)
    exact = _ranked(s, q, "off")
    pruned = _ranked(s, q, "force")
    assert exact == pruned or all(
        e[0] == p[0] and e[1] == pytest.approx(p[1], abs=1e-9)
        for e, p in zip(exact, pruned)
    )


# ------------------------------------------------- WAND-AND (round 3 #1)
# Block-max pruning for required conjunctions: pruning='force' on
# +a +b [-c] queries must return EXACTLY the full-decode result —
# ids and scores — for every sign mix, k regime, and tier layout.


def _assert_and_parity(searcher, q, k):
    """Exactness up to legitimate tie permutation: near-tied docs sum
    their 2-3 float contributions in nondeterministic aggregation
    order on BOTH paths, so raw rank comparison flips at ulp-level
    ties. Assert instead that (a) the pruned top-k's rounded score
    multiset equals the exact top-k's, and (b) every pruned doc
    carries its exact-path score at 1e-9."""
    full = {
        r["doc_id"]: r["score"]
        for r in searcher.search(q, k=0, score_mode="bm25", pruning="off").collect()
    }
    pruned = [
        (r["doc_id"], r["score"])
        for r in searcher.search(
            q, k=k, score_mode="bm25", pruning="force"
        ).collect()
    ]
    assert len(pruned) == min(k, len(full))
    for doc, score in pruned:
        assert doc in full, f"pruned returned non-hit doc {doc}"
        assert score == pytest.approx(full[doc], abs=1e-9)
    exact_topk = sorted((round(s, 9) for s in full.values()), reverse=True)[:k]
    assert sorted((round(s, 9) for _d, s in pruned), reverse=True) == exact_topk


@pytest.mark.parametrize(
    "q",
    [
        "+text:spark +text:index",
        "+text:spark +text:index -text:vector",
        "+text:spark +text:index +text:merge",
        "+text:table -text:vector",
    ],
)
@pytest.mark.parametrize("k", [5, 25, 200])
def test_wand_and_parity(spark_index, q, k):
    _assert_and_parity(SparkSearcher(spark_index), q, k)


def test_wand_and_mixed_signs_parity(spark_index):
    """required + optional + prohibited in one MultiTermQuery: optional
    terms score, the conjunction check only covers the required one."""
    q = MultiTermQuery(
        [Term("spark", "text"), Term("index", "text"), Term("vector", "text")],
        [True, None, False],
    )
    _assert_and_parity(SparkSearcher(spark_index), q, 25)


def test_wand_and_boosted_parity(spark_index):
    q = MultiTermQuery(
        [Term("spark", "text"), Term("index", "text")], [True, True]
    )
    q.boost = 2.5
    _assert_and_parity(SparkSearcher(spark_index), q, 25)


def test_wand_and_duplicate_required_term(spark_index):
    """'+spark +spark index' — the duplicated required term must carry a
    doubled weight in the bounds or pruning under-bounds it."""
    q = MultiTermQuery(
        [Term("spark", "text"), Term("spark", "text"), Term("index", "text")],
        [True, True, None],
    )
    _assert_and_parity(SparkSearcher(spark_index), q, 25)


def test_wand_and_on_tiered_index(spark, tmp_path_factory):
    """Conjunction pruning must stay exact when unmerged streaming tiers
    are attached (block identity includes doc_base)."""
    import lucene_spark.streaming.incremental as inc
    from lucene_spark.index.builder import IndexConfig, build_index, load_index

    d = str(tmp_path_factory.mktemp("wand_and_delta"))
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    )
    base_rows = [
        (
            "c0",
            i,
            "user",
            ("alpha beta " + "alpha " * (i % 4)) + ("gamma " if i % 3 else ""),
            None,
            None,
        )
        for i in range(40)
    ]
    cfg = IndexConfig(field_policy={"text": "text"}, seg_size=16)
    build_index(spark, spark.createDataFrame(base_rows, schema), d, cfg)
    inc.IncrementalIndexWriter(d, cfg).process_batch(
        spark.createDataFrame(
            [
                ("c9", i, "user", "alpha beta alpha beta gamma", None, None)
                for i in range(6)
            ],
            schema,
        ),
        0,
    )
    ix = load_index(spark, d)
    s = SparkSearcher(ix)
    for q in ["+text:alpha +text:beta", "+text:alpha +text:beta -text:gamma"]:
        _assert_and_parity(s, q, 30)
    assert any(doc >= 40 for doc, _ in _ranked(s, "+text:alpha +text:beta", "off", k=30))
    # cogroup kernel across tiers: ranges key on doc_base, which is
    # globally unique across tiers, so shared (seg_id, block_id) pairs
    # cannot collide
    from lucene_spark.search.executor import topk_wand_and

    terms, weights, req, pro = _and_query_parts(
        ix, "+text:alpha +text:beta -text:gamma"
    )
    c, st = topk_wand_and(
        ix, terms, weights, req, pro, k=30,
        collect_stats=True, intersect_max_df=0,
    )
    assert st["path"] == "cogroup"
    exact = {
        r["doc_id"]: r["score"]
        for r in s.search(
            "+text:alpha +text:beta -text:gamma", k=0,
            score_mode="bm25", pruning="off",
        ).collect()
    }
    got = {r["doc_id"]: r["score"] for r in c.collect()}
    assert set(got) <= set(exact) and len(got) == min(30, len(exact))
    for doc, sc_ in got.items():
        assert sc_ == pytest.approx(exact[doc], abs=1e-9)


# --------------------------------------- intersection fetch (round 3)
# When the rarest required term's df fits a driver collect, the
# conjunction runs as a selectivity-ordered intersection: decode the
# rarest term, push its doc ids into the decode kernel as doc_filter,
# fetch the other terms' rows on candidates only. Both branches of
# topk_wand_and must return the exact top-k.


def _and_query_parts(ix, qs):
    from lucene_spark.search.executor import _wand_and_query
    from lucene_spark.search.parser import parse_query
    from lucene_spark.search.similarity import bm25_idf

    q = parse_query(qs).rewrite(ix).optimize(ix)
    scorable, pro = _wand_and_query(q)
    terms = [t for t, _m, _r in scorable]
    N = ix.n_docs
    weights = [
        q.boost * m * bm25_idf(ix.doc_freq(t), N) for t, m, _r in scorable
    ]
    req = [r for _t, _m, r in scorable]
    return terms, weights, req, pro


@pytest.mark.parametrize(
    "qs",
    [
        "+text:spark +text:index",
        "+text:spark +text:index -text:vector",
        "+text:spark text:index",
    ],
)
def test_intersect_and_bucket_paths_agree(spark_index, qs):
    """All three conjunction strategies — bound-pruned buckets,
    candidate intersection, co-grouped range kernel — return the same
    exact top-k."""
    from lucene_spark.search.executor import topk_wand_and

    terms, weights, req, pro = _and_query_parts(spark_index, qs)
    a, sa = topk_wand_and(
        spark_index, terms, weights, req, pro, k=25,
        collect_stats=True, intersect_max_df=0, hot_strategy="bucket",
    )
    b, sb = topk_wand_and(
        spark_index, terms, weights, req, pro, k=25, collect_stats=True
    )
    c, sc_ = topk_wand_and(
        spark_index, terms, weights, req, pro, k=25,
        collect_stats=True, intersect_max_df=0,
    )
    assert sa["path"] == "bucket" and sb["path"] == "intersect"
    assert sc_["path"] == "cogroup"
    ra = sorted((r["doc_id"], round(r["score"], 9)) for r in a.collect())
    rb = sorted((r["doc_id"], round(r["score"], 9)) for r in b.collect())
    rc = sorted((r["doc_id"], round(r["score"], 9)) for r in c.collect())
    assert ra == rb == rc
    # every emitted row is on a candidate doc: emitted ≤ Σ df and the
    # candidate count equals the rarest required term's df
    assert sb["rows_emitted"] <= sb["rows_total"]
    assert sb["n_candidates"] == min(
        spark_index.doc_freq(t) for t, r in zip(terms, req) if r
    )


def test_doc_filter_kernel(spark_index):
    """decode_postings(doc_filter=ids) ≡ decode-then-filter, and the
    empty filter emits nothing."""
    import numpy as np

    from lucene_spark.search.executor import decode_postings

    t = Term("spark", "text")
    full = decode_postings(spark_index, [t]).collect()
    docs = sorted({r["doc_id"] for r in full})
    pick = np.asarray(docs[::3], dtype=np.int64)
    picked = set(pick.tolist())
    got = decode_postings(spark_index, [t], doc_filter=pick).collect()
    want = [r for r in full if r["doc_id"] in picked]
    key = lambda r: (r["qid"], r["doc_id"])  # noqa: E731
    assert sorted((key(r), r["tf"], r["dl"]) for r in got) == sorted(
        (key(r), r["tf"], r["dl"]) for r in want
    )
    assert (
        decode_postings(
            spark_index, [t], doc_filter=np.asarray([], dtype=np.int64)
        ).count()
        == 0
    )
    # Round 4 made position decodes filterable too (executor.py doc_filter
    # + need_positions): same decode-then-filter equivalence with positions.
    full_pos = decode_postings(spark_index, [t], need_positions=True).collect()
    got_pos = decode_postings(
        spark_index, [t], need_positions=True, doc_filter=pick
    ).collect()
    want_pos = [r for r in full_pos if r["doc_id"] in picked]
    assert sorted(
        (key(r), r["tf"], list(r["positions"])) for r in got_pos
    ) == sorted((key(r), r["tf"], list(r["positions"])) for r in want_pos)


# ---------------------------------------------------------- ADVICE #2
def test_batch_base_falls_back_without_doc_base(spark, tmp_path):
    """Delta metas written by the pre-round-2 writer lack doc_base; the
    writer must degrade to base + Σ n_docs instead of failing."""
    from lucene_spark.streaming.incremental import IncrementalIndexWriter

    d = str(tmp_path / "ix")
    os.makedirs(d)
    with open(os.path.join(d, "stats.json"), "w") as fh:
        json.dump({"n_docs": 100}, fh)
    meta_dir = os.path.join(d, "delta", "meta")
    for bid, nd in [(0, 7), (1, 5), (9, 99)]:
        spark.createDataFrame(
            [(bid, nd)], "batch_id long, n_docs long"
        ).write.parquet(os.path.join(meta_dir, f"batch={bid}"))
    w = IncrementalIndexWriter(d)
    # prior batches 0 and 1 → 100 + 7 + 5 (batch 9 is not prior to 3)
    assert w._batch_base(spark, 3) == 112
    assert w._batch_base(spark, 0) == 100


# ---------------------------------------------------------- ADVICE #3
def test_chunk_span_legacy_resume(tmp_path):
    from lucene_spark.index.builder import (
        MAX_BUILD_CHUNKS,
        IndexConfig,
        _resolve_chunk_span,
    )

    cfg = IndexConfig(seg_size=1, segments_per_commit=1)
    max_doc = MAX_BUILD_CHUNKS * 4  # uncapped would need 4x the cap
    # fresh build: cap applies
    d1 = str(tmp_path / "fresh")
    os.makedirs(d1)
    span = _resolve_chunk_span(d1, cfg, max_doc, set(), resume=True)
    assert span > 1 and (max_doc // span) + 1 <= MAX_BUILD_CHUNKS
    # plan persisted and honored on a later resume, even with done work
    assert _resolve_chunk_span(d1, cfg, max_doc, {0, 1}, resume=True) == span
    # legacy resume: manifests exist but no build_plan.json → the
    # ORIGINAL uncapped span (seg_size * segments_per_commit), persisted
    d2 = str(tmp_path / "legacy")
    os.makedirs(d2)
    span2 = _resolve_chunk_span(d2, cfg, max_doc, {0, 1, 2}, resume=True)
    assert span2 == cfg.seg_size * cfg.segments_per_commit == 1
    with open(os.path.join(d2, "build_plan.json")) as fh:
        assert json.load(fh)["chunk_span"] == 1


# ---------------------------------------------------------- ADVICE #4
def test_hash_split_requires_full_allocation(spark):
    from lucene_spark.ops.sampling import hash_split

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="rest_name"):
        hash_split(df, "doc_id", {"train": 0.8, "val": 0.1})
    with pytest.raises(ValueError, match="rest_name"):
        hash_split(df, "doc_id", {"train": 0.5})
    with pytest.raises(ValueError, match="<= 1"):
        hash_split(df, "doc_id", {"train": 0.8, "val": 0.4})
    # explicit remainder label: the leftover 10% lands in 'rest'
    out = hash_split(
        df, "doc_id", {"train": 0.8, "val": 0.1}, rest_name="rest"
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count()
              .withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "rest"}
    assert counts["train"] > counts["val"] + counts["rest"]
    # exact allocation still works without rest_name
    ok = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert ok.count() == 500


# ----------------------------------------------- docs-phase JVM fast path
def test_docs_lengths_jvm_path_matches_python(spark):
    """_docs_with_lengths' codegen token-count path (no text through
    Arrow) must produce byte-identical len/norm columns to the Python
    kernel, across stop words, min length, lowercase, per-field boosts,
    doc boosts and per-doc-field boosts."""
    from lucene_spark.analysis import Analyzer
    from lucene_spark.index.builder import (
        IndexConfig,
        _docs_with_lengths,
        _jvm_token_count,
    )

    rows = [
        (0, "The quick brown Fox and a dog 42", "en", 2.0, 1.5),
        (1, "", None, None, None),
        (2, "a an of to at", "de", 0.5, None),
        (3, None, "fr", 1.0, 3.0),
        (4, "Xy z qq multiWord tokens HERE the", "en", None, 0.25),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, db double, boost_text double"
    )
    ana = Analyzer(
        "[a-zA-Z0-9]+",
        lowercase=True,
        stop_words=frozenset({"the", "a", "an", "of", "to", "at", "and"}),
        min_length=2,
        name="t",
    )
    cfg = IndexConfig(
        field_policy={"text": "text", "lang": "keyword"},
        analyzer=ana,
        field_boosts={"text": 1.25},
        doc_boost_col="db",
    )
    assert _jvm_token_count(ana, None) is not None  # fast path engaged
    fast = {r["doc_id"]: r for r in _docs_with_lengths(df, cfg).collect()}

    # force the Python kernel by making the analyzer non-JVM-expressible
    # (translit=True changes nothing on this pure-ASCII corpus)
    ana_py = Analyzer(
        ana.token_pattern, lowercase=True, stop_words=ana.stop_words,
        min_length=2, translit=True, name="t",
    )
    cfg_py = IndexConfig(
        field_policy=cfg.field_policy, analyzer=ana_py,
        field_boosts=cfg.field_boosts, doc_boost_col="db",
    )
    assert _jvm_token_count(ana_py, None) is None
    slow = {r["doc_id"]: r for r in _docs_with_lengths(df, cfg_py).collect()}
    for d in fast:
        for c in ["len_text", "norm_text", "len_lang", "norm_lang"]:
            assert fast[d][c] == slow[d][c], (d, c, fast[d][c], slow[d][c])


def test_docs_lengths_jvm_path_rejects_unsupported(spark):
    from lucene_spark.analysis import Analyzer, text_ci
    from lucene_spark.index.builder import _jvm_token_count

    assert _jvm_token_count(text_ci(), None) is None  # translit
    assert _jvm_token_count(Analyzer(r"[^\W\d_]+"), None) is None  # \W class


def test_cogroup_missing_required_term_empty(spark_index):
    from lucene_spark.search.executor import topk_and_cogrouped

    terms = [Term("spark", "text"), Term("zzznotaterm", "text")]
    out, _ = topk_and_cogrouped(
        spark_index, terms, [1.0, 1.0], [True, True], k=10
    )
    assert out.count() == 0


def test_cogroup_rejects_contradictory_signs(spark_index):
    from lucene_spark.search.executor import topk_and_cogrouped

    t = Term("spark", "text")
    with pytest.raises(ValueError):
        topk_and_cogrouped(
            spark_index, [t], [1.0], [True], pro_terms=[t], k=5
        )


def test_cogroup_pure_disjunction_parity(spark_index):
    """n_req=0 degenerate case: the cogroup kernel serves a pure OR
    (bounded-shuffle strategy for uniform-impact corpora) and must
    match the exact disjunction top-k."""
    from lucene_spark.search.executor import topk_and_cogrouped
    from lucene_spark.search.similarity import bm25_idf

    terms = [Term("spark", "text"), Term("index", "text"), Term("merge", "text")]
    N = spark_index.n_docs
    w = [bm25_idf(spark_index.doc_freq(t), N) for t in terms]
    out, _ = topk_and_cogrouped(
        spark_index, terms, w, [False, False, False], k=25
    )
    got = sorted((r["doc_id"], round(r["score"], 9)) for r in out.collect())
    s = SparkSearcher(spark_index)
    exact = s.search(
        "text:spark text:index text:merge", k=25,
        score_mode="bm25", pruning="off",
    ).collect()
    want = sorted((r["doc_id"], round(r["score"], 9)) for r in exact)
    assert got == want
