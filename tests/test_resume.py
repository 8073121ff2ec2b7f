"""Checkpoint/resume: a killed phase-A build resumes without recomputing
finished segments (north rule: per-partition segment manifests with
lineage + counts)."""

import os

from pyspark.sql import functions as F


def test_resume_skips_done_segments(spark, transcripts_df, tmp_path):
    from lucene_spark.index import IndexConfig, build_index
    from lucene_spark.index.builder import (
        POSTINGS_SCHEMA,
        _docs_with_lengths,
        _invert_segment,
        assign_doc_ids,
    )

    d = str(tmp_path / "ix")
    cfg = IndexConfig(seg_size=100, segments_per_commit=2)

    # simulate a partial run: docs written, only segment 0 inverted+manifested
    df = assign_doc_ids(transcripts_df, ["conv_id", "turn_idx"])
    docs = _docs_with_lengths(df, cfg)
    docs.write.mode("overwrite").parquet(os.path.join(d, "docs"))
    docs_r = spark.read.parquet(os.path.join(d, "docs"))
    seg0 = docs_r.withColumn(
        "seg_id", (F.col("doc_id") / cfg.seg_size).cast("long")
    ).where(F.col("seg_id") == 0)
    blocks = seg0.groupBy("seg_id").applyInPandas(_invert_segment(cfg), POSTINGS_SCHEMA)
    blocks.write.mode("append").partitionBy("seg_id").parquet(
        os.path.join(d, "segments")
    )
    spark.createDataFrame(
        [(0, 1, 1, 0, 99, 1, "sentinel")],
        "seg_id long, n_postings long, n_tokens long, min_doc_id long, "
        "max_doc_id long, n_blocks long, lineage string",
    ).write.mode("append").parquet(os.path.join(d, "manifests"))

    ix = build_index(spark, transcripts_df, d, cfg, resume=True)

    # the sentinel manifest row proves segment 0 was NOT recomputed
    m = spark.read.parquet(os.path.join(d, "manifests"))
    lineages = {r["lineage"] for r in m.where(F.col("seg_id") == 0).collect()}
    assert lineages == {"sentinel"}
    # every segment present exactly once
    segs = [r["seg_id"] for r in m.select("seg_id").collect()]
    assert len(segs) == len(set(segs))
    # and the index is complete: all docs covered
    assert ix.n_docs == transcripts_df.count()
