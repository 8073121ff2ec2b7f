"""Diagnose OR-disjunction pruning: build (and cache) the wand_bench
corpus index, then for a query print θ, the per-term global max impact,
the true top-k score composition (how many query terms each top doc
matches), and the distribution of per-bucket survivor bounds — the
numbers that decide whether `_sub + Σ_{t'≠t} bucketmax ≥ θ` can prune.

Usage: python tools/wand_diag.py [n_docs] [query]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lucene_spark.analysis import Analyzer  # noqa: E402
from lucene_spark.index.builder import IndexConfig, build_index, load_index  # noqa: E402
from lucene_spark.search.executor import (  # noqa: E402
    WAND_BUCKET,
    SparkSearcher,
    _bucketed_sub,
    _sub_meta,
    topk_wand,
)
from lucene_spark.search.parser import parse_query  # noqa: E402
from lucene_spark.search.similarity import bm25_idf  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402
from tools.wand_bench import varied_corpus  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    qs = sys.argv[2] if len(sys.argv) > 2 else "text:w50 OR text:w300 OR text:w2000"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        app_name="wand_diag", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = f"/tmp/wand_diag_idx_{n_docs}"
    if os.path.exists(os.path.join(d, "stats.json")):
        ix = load_index(spark, d)
    else:
        cfg = IndexConfig(
            field_policy={"text": "text"},
            analyzer=Analyzer("[a-zA-Z0-9]+", lowercase=True, name="bench"),
            seg_size=16384,
            store_positions=False,
        )
        ix = build_index(
            spark, varied_corpus(spark, n_docs), d, cfg, order_cols=["doc_id"]
        )
    s = SparkSearcher(ix)
    q = parse_query(qs).rewrite(ix).optimize(ix)
    terms = [q.term] if hasattr(q, "term") else list(q.terms)
    N = ix.n_docs
    weights = [bm25_idf(ix.doc_freq(t), N) for t in terms]
    print("terms:", [(t.text, ix.doc_freq(t)) for t in terms])
    print("weights:", [round(w, 3) for w in weights])

    # exact top-2k to see score composition
    exact = s.execute(q, k=30, pruning="off").collect()
    print("exact top-10 scores:", [round(r["score"], 3) for r in exact[:10]])
    theta_true = exact[9]["score"] if len(exact) >= 10 else float("-inf")
    print("true kth (k=10):", round(theta_true, 4))

    smeta = _sub_meta(ix, terms, weights)
    bmeta = _bucketed_sub(smeta)
    bmax = bmeta.groupBy("_bkt", "field", "term").agg(F.max("_sub").alias("_bmax"))
    # per-term global max impact
    for r in bmax.groupBy("term").agg(F.max("_bmax").alias("m")).collect():
        print(f"  global max impact {r['term']}: {r['m']:.4f}")
    bsum = bmax.groupBy("_bkt").agg(
        F.sum("_bmax").alias("_bsum"), F.count("*").alias("_nterms")
    )
    import pandas as pd  # noqa: F401

    pdf = bsum.toPandas()
    print("buckets occupied:", len(pdf), "of", (N // WAND_BUCKET) + 1)
    print("nterms histogram:", pdf["_nterms"].value_counts().to_dict())
    bs = np.sort(pdf["_bsum"].to_numpy())[::-1]
    print(
        "bucket Σbmax quantiles:",
        {q_: round(float(np.quantile(bs, q_)), 3) for q_ in (0.0, 0.25, 0.5, 0.75, 0.9, 1.0)},
    )
    print(
        "buckets with Σbmax >= true kth:",
        int((bs >= theta_true).sum()),
        "/",
        len(bs),
    )
    # what θ does the seed actually find?
    out, stats = topk_wand(ix, terms, weights, k=10, collect_stats=True)
    print("topk_wand stats:", stats)
    # per-doc term-match counts among exact top-10
    docs = [r["doc_id"] for r in exact[:10]]
    from lucene_spark.search.executor import decode_postings

    dec = (
        decode_postings(ix, terms, docs_only=True)
        .where(F.col("doc_id").isin(docs))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .collect()
    )
    print("top-10 doc term-match counts:", sorted([r["nt"] for r in dec], reverse=True))
    spark.stop()


if __name__ == "__main__":
    main()
