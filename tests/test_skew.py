"""Hot-term skew: a term present in EVERY doc must not pin the merge to
one reducer. Because segments are doc-range disjoint, the merge's
repartitionByRange(field, term, doc_base) splits the hot term's blocks
across consecutive partitions at (term, doc_base) boundaries — with
per-partition doc ranges disjoint, so concatenation needs no re-sort
(the north rule's salted-repartition requirement, by construction)."""

import os

from pyspark.sql import functions as F


def test_hot_term_blocks_split_across_partitions(spark, tmp_path):
    from lucene_spark.index import IndexConfig, build_index

    # every turn contains the hot term; 8k docs → ~63 blocks of ≤128
    rows = [
        (f"conv{i // 50:06d}", i % 50, "user", f"hot filler{i % 997} word{i % 31}", None, None)
        for i in range(8000)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    cfg = IndexConfig(
        field_policy={"text": "text"},
        seg_size=1000,
        merge_partitions=8,
    )
    d = str(tmp_path / "ix")
    ix = build_index(spark, df, d, cfg)

    hot = ix.postings.where(
        (F.col("field") == "text") & (F.col("term") == "hot")
    ).withColumn("file", F.input_file_name())
    rowsc = hot.select("file", "doc_base", "max_docid").collect()
    # the hot term spans many blocks...
    assert len(rowsc) >= 60
    # ...which landed in MULTIPLE merge output partitions (files)
    files = {r["file"] for r in rowsc}
    assert len(files) >= 2, "hot term must be split across partitions"
    # and per-file doc ranges are disjoint + ordered (no re-sort needed)
    spans = []
    for f in files:
        rs = [r for r in rowsc if r["file"] == f]
        spans.append((min(r["doc_base"] for r in rs), max(r["max_docid"] for r in rs)))
    spans.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "per-partition doc ranges must be disjoint"

    # postings for the hot term reconstruct every doc exactly once
    from lucene_spark.search.executor import dump_postings

    dumped = dump_postings(ix, "text").where(F.col("term") == "hot")
    assert dumped.count() == 8000
    assert dumped.select("doc_id").distinct().count() == 8000
