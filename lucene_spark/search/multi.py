"""MultiSearcher: ranked search across several indexes.

Reference: ``MultiSearcher::find`` runs the query per sub-index,
shifts docIDs by the preceding indexes' sizes and concatenates WITHOUT
re-sorting (a documented @todo — src/MultiSearcher.php:370-395). We
keep the id-shifting contract but do the global re-rank correctly:
take top-k per index (cheap, parallel), union the small per-index
results, re-sort globally — the standard scatter/gather top-k.

Caveat shared with the reference: scores are computed against each
sub-index's own stats (df, N, avgdl), so cross-index scores are only
comparable when the sub-corpora are statistically similar. A
global-stats mode would broadcast merged (df, N, avgdl) into each
sub-query; not needed for reference parity.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from lucene_spark.index.builder import SparkIndex
from lucene_spark.search.executor import SparkSearcher


class MultiSearcher:
    def __init__(self, indexes: list[SparkIndex]):
        if not indexes:
            raise ValueError("MultiSearcher needs at least one index")
        self.indexes = indexes
        self.offsets = []
        acc = 0
        for ix in indexes:
            self.offsets.append(acc)
            acc += ix.n_docs
        self.total_docs = acc

    def search(
        self,
        query,
        k: int = 10,
        score_mode: str = "bm25",
        default_field: str | None = None,
    ) -> DataFrame:
        """Global top-k over all sub-indexes; doc_id is globally shifted
        (sub-index local id + Σ preceding sizes — src/Index.php:866-873).
        """
        parts = []
        for ix, off in zip(self.indexes, self.offsets):
            hits = SparkSearcher(ix).search(
                query, k=k, score_mode=score_mode, default_field=default_field
            )
            parts.append(
                hits.select(
                    (F.col("doc_id") + F.lit(off)).alias("doc_id"), "score"
                )
            )
        un = reduce(lambda a, b: a.unionByName(b), parts)
        out = un.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return out.limit(k) if k else out
