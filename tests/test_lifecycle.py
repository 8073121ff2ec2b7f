"""Deletes, optimize, field sort, MultiSearcher, highlighting."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def small_index(spark, transcripts_df, tmp_path):
    from lucene_spark.index import IndexConfig, build_index

    d = str(tmp_path / "ix")
    return build_index(spark, transcripts_df, d, IndexConfig(seg_size=100))


def _top_ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_delete_hides_docs_but_keeps_stats(spark, small_index):
    from lucene_spark.index.lifecycle import delete_docs, deleted_count
    from lucene_spark.search.executor import SparkSearcher

    s = SparkSearcher(small_index)
    before = s.search("text:spark", k=5).collect()
    assert before
    victim = before[0]["doc_id"]
    n_before = small_index.n_docs

    gen = delete_docs(small_index, [int(victim)])
    assert gen == 0
    assert deleted_count(small_index) == 1
    after = s.search("text:spark", k=5).collect()
    assert victim not in [r["doc_id"] for r in after]
    # reference quirk W2: idf stats keep counting deleted docs until
    # optimize — scores of surviving docs must be unchanged
    surviving = {r["doc_id"]: r["score"] for r in before if r["doc_id"] != victim}
    for r in after:
        if r["doc_id"] in surviving:
            assert abs(r["score"] - surviving[r["doc_id"]]) < 1e-12
    assert small_index.n_docs == n_before  # maxDoc incl. deleted

    # second delete generation
    victim2 = after[0]["doc_id"]
    assert delete_docs(small_index, [int(victim2)]) == 1
    assert deleted_count(small_index) == 2


def test_undelete_all_restores_docs_and_scores(spark, small_index):
    """≙ reference undeleteAll() (SearchIndexInterface.php:336) — the
    reference's own body is an empty @todo (Index.php:1286-1288); here
    restored docs must come back rank- and score-identical because
    deletes never touched idf/norms (quirk W2)."""
    from lucene_spark.index.lifecycle import delete_docs, deleted_count, undelete_all
    from lucene_spark.search.executor import SparkSearcher

    s = SparkSearcher(small_index)
    before = s.search("text:spark", k=5).collect()
    assert len(before) >= 2
    # two tombstone generations, then restore both
    delete_docs(small_index, [int(before[0]["doc_id"])])
    delete_docs(small_index, [int(before[1]["doc_id"])])
    assert deleted_count(small_index) == 2

    # reference reader-protocol views of the deleted state
    assert small_index.has_deletions()
    assert small_index.is_deleted(int(before[0]["doc_id"]))
    assert not small_index.is_deleted(int(before[2]["doc_id"]))
    assert small_index.num_docs() == small_index.n_docs - 2

    assert undelete_all(small_index) == 2
    assert deleted_count(small_index) == 0
    assert small_index.tombstones is None
    assert not small_index.has_deletions()
    assert not small_index.is_deleted(int(before[0]["doc_id"]))
    assert small_index.num_docs() == small_index.n_docs
    restored = s.search("text:spark", k=5).collect()
    assert [(r["doc_id"], round(r["score"], 12)) for r in restored] == [
        (r["doc_id"], round(r["score"], 12)) for r in before
    ]
    # idempotent on a tombstone-free index
    assert undelete_all(small_index) == 0


def test_multisearcher_undelete_all(spark, transcripts_df, tmp_path):
    """≙ MultiSearcher::undeleteAll() fan-out (MultiSearcher.php:834-839)."""
    from lucene_spark.index import IndexConfig, build_index
    from lucene_spark.index.lifecycle import delete_docs, deleted_count
    from lucene_spark.search.multi import MultiSearcher

    half = transcripts_df.where(F.col("conv_id") < "conv00000020")
    rest = transcripts_df.where(F.col("conv_id") >= "conv00000020")
    ix1 = build_index(spark, half, str(tmp_path / "a"), IndexConfig(seg_size=100))
    ix2 = build_index(spark, rest, str(tmp_path / "b"), IndexConfig(seg_size=100))
    ms = MultiSearcher([ix1, ix2])
    before = [(r["doc_id"], round(r["score"], 12)) for r in ms.search("text:spark", k=6).collect()]
    delete_docs(ix1, [0])
    delete_docs(ix2, [1, 2])
    assert deleted_count(ix1) + deleted_count(ix2) == 3
    assert ms.undelete_all() == 3
    assert deleted_count(ix1) == 0 and deleted_count(ix2) == 0
    after = [(r["doc_id"], round(r["score"], 12)) for r in ms.search("text:spark", k=6).collect()]
    assert after == before


def test_optimize_expunges_and_renumbers(spark, small_index, tmp_path):
    from lucene_spark.index.lifecycle import delete_docs, optimize_index
    from lucene_spark.search.executor import SparkSearcher

    n = small_index.n_docs
    delete_docs(small_index, [0, 1, 5])
    out = optimize_index(small_index, str(tmp_path / "opt"))
    assert out.n_docs == n - 3
    # dense renumbering: ids are 0..n-4, old ids kept as docMap lineage
    ids = [r["doc_id"] for r in out.docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(n - 3))
    old = dict(
        (r["doc_id"], r["old_doc_id"])
        for r in out.docs.select("doc_id", "old_doc_id").collect()
    )
    # docMap ordering: new id order == surviving old id order
    olds = [old[i] for i in range(n - 3)]
    assert olds == sorted(olds)
    assert not {0, 1, 5} & set(olds)
    # optimized index searches without tombstones
    assert out.tombstones is None
    assert SparkSearcher(out).search("text:spark", k=3).count() > 0


def test_sort_by_stored_field(spark, small_index):
    from lucene_spark.search.executor import SparkSearcher

    s = SparkSearcher(small_index)
    hits = s.search("text:spark", k=10, sort_fields=[("role", "asc")]).collect()
    roles = [r["role"] for r in hits]
    assert roles == sorted(roles)
    # id ASC tiebreak within equal keys
    for a, b in zip(hits, hits[1:]):
        if a["role"] == b["role"]:
            assert a["doc_id"] < b["doc_id"]


def test_multisearcher_global_topk(spark, transcripts_df, tmp_path):
    from lucene_spark.index import IndexConfig, build_index
    from lucene_spark.search.executor import SparkSearcher
    from lucene_spark.search.multi import MultiSearcher

    half = transcripts_df.where(F.col("conv_id") < "conv00000020")
    rest = transcripts_df.where(F.col("conv_id") >= "conv00000020")
    ix1 = build_index(spark, half, str(tmp_path / "a"), IndexConfig(seg_size=100))
    ix2 = build_index(spark, rest, str(tmp_path / "b"), IndexConfig(seg_size=100))
    ms = MultiSearcher([ix1, ix2])
    assert ms.total_docs == transcripts_df.count()
    hits = ms.search("text:spark", k=8).collect()
    assert len(hits) == 8
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)
    # ids from the second index are shifted beyond the first index's size
    per1 = SparkSearcher(ix1).search("text:spark", k=8).collect()
    assert any(r["doc_id"] >= ix1.n_docs for r in hits) or len(per1) >= 8


def test_highlighting(spark, small_index):
    from lucene_spark.search.highlight import (
        highlight_column,
        highlight_terms,
    )
    from lucene_spark.search.parser import parse_query

    q = parse_query("spark OR merge", "text").rewrite(small_index).optimize(small_index)
    terms = highlight_terms(q)
    assert set(terms) == {"spark", "merge"}
    df = spark.createDataFrame(
        [("Spark sparkling merge remerge",)], "t string"
    ).select(highlight_column("t", terms).alias("h"))
    assert df.collect()[0]["h"] == "<b>Spark</b> sparkling <b>merge</b> remerge"
    # prohibited terms are not highlighted
    q2 = parse_query("+spark -merge", "text").rewrite(small_index).optimize(small_index)
    assert set(highlight_terms(q2)) == {"spark"}
