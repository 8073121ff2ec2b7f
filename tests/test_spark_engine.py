"""Spark engine vs pure-Python model: rank identity on synthetic
transcripts for every query class, both scoring modes."""

import pytest

from lucene_spark.search.executor import SparkSearcher, topk_term_pruned
from lucene_spark.search.query import FuzzyQuery, Term, WildcardQuery

QUERIES = [
    "text:spark",
    "text:index",
    "text:spark AND text:merge",
    "text:spark OR text:wildcard",
    "text:spark AND NOT text:merge",
    "+text:spark -text:merge text:index",
    'text:"spark index"',
    'text:"index term"~2',
    "role:assistant AND text:query",
    "text:spark AND (text:merge OR text:fuzzy)",
    "text:deploy",  # mixed-case source token
    "text:[wild TO word]",
    "text:{wild TO word}",
]


@pytest.fixture(scope="module")
def searcher(spark_index):
    return SparkSearcher(spark_index)


def _model_hits(model_index, q, mode, k=None):
    hits = model_index.find(q, score_mode=mode)
    return [(h.doc_id, round(h.score, 9)) for h in (hits[:k] if k else hits)]


def _spark_hits(searcher, q, mode, k=0):
    rows = searcher.search(q, k=k, score_mode=mode).collect()
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("mode", ["bm25", "classic"])
def test_rank_identity(searcher, model_index, query, mode):
    """Rank identity vs the pure-Python model, modulo float-tie groups
    (see conftest.assert_rank_parity for the documented tradeoff)."""
    from tests.conftest import assert_rank_parity

    got = _spark_hits(searcher, query, mode)
    want = _model_hits(model_index, query, mode)
    assert_rank_parity(got, want, msg=f"{query} ({mode})")


@pytest.mark.parametrize("mode", ["bm25", "classic"])
def test_wildcard_and_fuzzy(searcher, model_index, mode):
    old_w, old_f = WildcardQuery.min_prefix_length, FuzzyQuery.default_prefix_length
    WildcardQuery.min_prefix_length = 2
    FuzzyQuery.default_prefix_length = 2
    try:
        for q in ["text:wild*", "text:se*ch", "text:spork~0.6"]:
            got = _spark_hits(searcher, q, mode)
            want = _model_hits(model_index, q, mode)
            assert [g[0] for g in got] == [w[0] for w in want], f"{q} ({mode})"
            for g, w in zip(got, want):
                assert g[1] == pytest.approx(w[1], abs=1e-6)
    finally:
        WildcardQuery.min_prefix_length = old_w
        FuzzyQuery.default_prefix_length = old_f


def test_topk_matches_full_sort(searcher, model_index):
    got = _spark_hits(searcher, "text:spark OR text:index", "bm25", k=5)
    want = _model_hits(model_index, "text:spark OR text:index", "bm25", k=5)
    assert [g[0] for g in got] == [w[0] for w in want]


def test_block_max_pruned_topk(spark_index, model_index):
    hits, stats = topk_term_pruned(spark_index, Term("index", "text"), k=10)
    want = _model_hits(model_index, "text:index", "bm25", k=10)
    assert [(h["doc_id"]) for h in hits] == [w[0] for w in want]
    for h, w in zip(hits, want):
        assert h["score"] == pytest.approx(w[1], abs=1e-9)
    assert stats["blocks_total"] >= stats["blocks_decoded"]


def test_docs_roundtrip_text_equality(spark_index, transcripts_rows):
    """Per-row invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering (BASELINE.json input_hint)."""
    rows = (
        spark_index.docs.select("doc_id", "conv_id", "turn_idx", "text")
        .orderBy("doc_id")
        .collect()
    )
    expected = sorted(transcripts_rows, key=lambda r: (r[0], r[1]))
    assert len(rows) == len(expected)
    for r, e in zip(rows, expected):
        assert (r["conv_id"], r["turn_idx"], r["text"]) == (e[0], e[1], e[3])
    assert [r["doc_id"] for r in rows] == list(range(len(rows)))


def test_term_dict_matches_model(spark_index, model_index):
    td = {
        (r["field"], r["term"]): (r["df"], r["cf"])
        for r in spark_index.term_dict.collect()
    }
    model_td = {
        (f, t): (
            len(postings),
            sum(len(ps) for ps in postings.values()),
        )
        for (f, t), postings in model_index.postings.items()
    }
    assert td == model_td
