"""Rank-identity of the pure-Python model vs the reference test oracle.

Expected (docId, score) lists transcribed from
/root/reference/tests/SearchTest.php:150-361 and IndexTest.php:163-210
(BASELINE.md §3). Scores at 1e-6 (reference asserts round(score, 6)).
"""

import pytest

from lucene_spark.search.query import (
    FuzzyQuery,
    Term,
    WildcardQuery,
)
from tests.ref_corpus import build_model_index, have_corpus

pytestmark = pytest.mark.skipif(
    not have_corpus(), reason="reference corpus not available"
)


@pytest.fixture(scope="module")
def ix():
    return build_model_index()


def assert_hits(hits, expected):
    assert [h.doc_id for h in hits] == [e[0] for e in expected]
    for h, e in zip(hits, expected):
        assert round(h.score, 6) == pytest.approx(e[1], abs=1.5e-6), (
            f"doc {h.doc_id}: {h.score} != {e[1]}"
        )


def test_low_level_anchors(ix):
    # IndexTest.php:171-210
    assert ix.term_docs(Term("packages", "contents")) == [0, 2, 6, 7, 8]
    assert ix.doc_freq(Term("packages", "contents")) == 5
    assert ix.norm(3, "contents") == pytest.approx(0.054688, abs=1e-6)


def test_term_query(ix):
    # SearchTest.php:154-159
    hits = ix.find("submitting")
    assert_hits(hits, [(2, 0.114555), (7, 0.112241), (8, 0.112241)])


def test_and_query(ix):
    # SearchTest.php:172-177
    hits = ix.find("submitting AND wishlists")
    assert_hits(hits, [(8, 0.141633)])


def test_phrase_query(ix):
    # SearchTest.php:185-191
    hits = ix.find('"reporting bugs"')
    assert_hits(
        hits,
        [(0, 0.247795), (7, 0.212395), (8, 0.212395), (2, 0.176996)],
    )


def test_boolean_nested(ix):
    # SearchTest.php:204-208
    hits = ix.find("submitting AND (wishlists OR requirements)")
    assert_hits(hits, [(7, 0.095697), (8, 0.075573)])


def test_boolean_with_phrase_subquery(ix):
    # SearchTest.php:217-231
    hits = ix.find('"PEAR developers" AND Home')
    assert_hits(hits, [(1, 0.168270)])


def test_nonexisting_phrase_subquery_optimizes_to_empty(ix):
    # SearchTest.php:233-244
    from lucene_spark.search.parser import parse_query
    from lucene_spark.search.query import EmptyResult

    q = parse_query('"Non-existing phrase" AND Home')
    assert str(q) == '+("Non-existing phrase") +(Home)'
    opt = q.rewrite(ix).optimize(ix)
    assert isinstance(opt, EmptyResult)


def test_filtered_number_token(ix):
    # SearchTest.php:246-262: number-only conjunct is insignificant
    assert ix.analyzer().terms("123456787654321") == []
    hits = ix.find('"PEAR developers" AND Home AND 123456787654321')
    assert_hits(hits, [(1, 0.168270)])


def test_wildcard(ix):
    # SearchTest.php:271-282 (minPrefixLength=0)
    old = WildcardQuery.min_prefix_length
    WildcardQuery.min_prefix_length = 0
    try:
        hits = ix.find("*cont*")
        assert_hits(
            hits,
            [
                (8, 0.125253),
                (4, 0.112122),
                (2, 0.108491),
                (7, 0.077716),
                (0, 0.050760),
                (1, 0.049163),
                (3, 0.036159),
                (5, 0.021500),
                (9, 0.007422),
            ],
        )
    finally:
        WildcardQuery.min_prefix_length = old


def test_fuzzy(ix):
    # SearchTest.php:300-311 (defaultPrefixLength=0)
    old = FuzzyQuery.default_prefix_length
    FuzzyQuery.default_prefix_length = 0
    try:
        hits = ix.find("tesd~0.4")
        assert_hits(
            hits,
            [
                (2, 0.037139),
                (0, 0.008735),
                (7, 0.002449),
                (1, 0.000483),
                (3, 0.000483),
                (9, 0.000483),
                (5, 0.000414),
                (8, 0.000414),
                (4, 0.000345),
            ],
        )
    finally:
        FuzzyQuery.default_prefix_length = old


def test_range_inclusive(ix):
    # SearchTest.php:326-333
    hits = ix.find("[xml TO zzzzz]")
    assert_hits(
        hits,
        [
            (4, 0.156366),
            (2, 0.080458),
            (7, 0.060214),
            (1, 0.009687),
            (5, 0.005871),
        ],
    )


def test_range_exclusive(ix):
    # SearchTest.php:346-354
    hits = ix.find("{xml TO zzzzz}")
    assert_hits(
        hits,
        [
            (2, 0.1308671),
            (7, 0.0979391),
            (4, 0.0633930),
            (1, 0.0157556),
            (5, 0.0095493),
        ],
    )
