"""Round-5 tests: LSH bucket-size skew cap + bucket diagnostics.

Reference anchor for the dedup family: the reference engine has no
dedup surface — these are the LLM-data-pipeline ops the brief adds.
The cap semantics mirror ngram_jaccard_pairs' max_shingle_df
(candidate-generation-only approximation; verification stays exact).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _dup_heavy_df(spark):
    """3 duplicate families (sizes 12, 6, 3) + 9 unrelated docs.

    Family texts are long enough that every member shares every LSH
    band key (identical shingle sets -> identical signatures), so the
    families become hot buckets in all 4 bands.
    """
    fam = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark executes distributed queries over columnar parquet files fast",
        "language models train on deduplicated corpora for better loss",
    ]
    rows = []
    nid = 0
    for fi, (text, n) in enumerate(zip(fam, [12, 6, 3])):
        for _ in range(n):
            rows.append((nid, text))
            nid += 1
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet colors rainbow sky",
        "north south east west compass directions map navigation travel",
        "apple banana cherry date elderberry fig grape fruit basket",
        "carbon hydrogen oxygen nitrogen helium neon argon gases table",
        "sonata symphony concerto opera quartet melody harmony rhythm",
        "mountain valley plateau canyon ridge summit slope terrain",
        "keyboard monitor mouse speaker cable desk chair office setup",
    ]
    for t in uniq:
        rows.append((nid, t))
        nid += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLshBucketCap:
    def test_stats_counts_hot_buckets(self, spark):
        from lucene_spark.ops.dedup import lsh_bucket_stats

        df = _dup_heavy_df(spark)
        stats = {
            r["bucket_size"]: (r["n_buckets"], r["cand_pairs"])
            for r in lsh_bucket_stats(df, "doc_id", "text").collect()
        }
        # each family collides in all 4 bands -> 4 buckets at its size
        assert stats[12][0] == 4 and stats[12][1] == 4 * 12 * 11 // 2
        assert stats[6][0] == 4 and stats[6][1] == 4 * 6 * 5 // 2
        assert stats[3][0] == 4 and stats[3][1] == 4 * 3 * 2 // 2

    def test_cap_preserves_clusters_cuts_pairs(self, spark):
        from lucene_spark.ops.dedup import (
            connected_components,
            minhash_lsh_pairs,
        )

        df = _dup_heavy_df(spark)
        full = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5)
        capped = minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.5, max_bucket_size=4
        )
        n_full = full.count()
        n_capped = capped.count()
        # clique pairs: 66 + 15 + 3 = 84; chains: 11 + 5 for the two
        # capped families, the size-3 family stays a clique (3 pairs)
        assert n_full == 84
        assert n_capped == 11 + 5 + 3
        # capped pairs are a subset of the exact pairs, values identical
        fullm = {
            (r["id_a"], r["id_b"]): r["jaccard"] for r in full.collect()
        }
        for r in capped.collect():
            assert fullm[(r["id_a"], r["id_b"])] == r["jaccard"]
        # the preserved property: identical CLUSTERS after components
        cf = {
            (r["id"], r["cluster_id"])
            for r in connected_components(full).collect()
        }
        cc = {
            (r["id"], r["cluster_id"])
            for r in connected_components(capped).collect()
        }
        assert cf == cc

    def test_cap_larger_than_every_bucket_is_exact(self, spark):
        from lucene_spark.ops.dedup import minhash_lsh_pairs

        df = _dup_heavy_df(spark)
        full = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(df, "doc_id", "text", 0.5).collect()
        }
        capped = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in minhash_lsh_pairs(
                df, "doc_id", "text", 0.5, max_bucket_size=1000
            ).collect()
        }
        assert full == capped


class TestOptimizeIdempotent:
    """BooleanQuery.optimize's single-clause collapse must not mutate a
    shared leaf: leaf optimize() returns SELF, so scaling the survivor's
    boost in place compounded across repeated optimize() calls — e.g.
    MultiSearcher, where every shard optimizes the same rewritten tree
    (reference collapse semantics: Boolean.php:141-412)."""

    class _Reader:
        def has_term(self, term):
            return True

    def test_double_optimize_does_not_compound_boost(self):
        from lucene_spark.search.query import (
            BooleanQuery, Insignificant, Term, TermQuery,
        )

        leaf = TermQuery(Term("foo", "text"))
        q = BooleanQuery()
        q.add_subquery(leaf, None)
        q.add_subquery(Insignificant(), None)
        q.set_boost(2.0)
        r = self._Reader()
        o1 = q.optimize(r)
        o2 = q.optimize(r)
        assert o1.boost == pytest.approx(2.0)
        assert o2.boost == pytest.approx(2.0)
        # the caller's leaf is untouched
        assert leaf.boost == pytest.approx(1.0)
