"""Similarity search over embedding columns (array<float>).

- :func:`brute_force_topk` — exact cosine top-k: one scan, a literal
  broadcast of the query vector, `zip_with`/`aggregate` dot product in
  whole-stage codegen (no shuffle except the final TakeOrdered).
- :func:`ivf_topk` — the scale path: vectors are pre-bucketed by a
  coarse quantizer (here: the `label` partition column or any cluster
  assignment); the query probes only the nearest centroid's bucket,
  turning a full scan into a partition-pruned scan. On a 100 TB table
  the bucket column is the Parquet/Iceberg partition key, so pruning
  happens at the manifest level before any IO.
- :func:`cosine_pairs` — all-pairs cosine >= threshold among n vectors.
  Quadratic by nature; intended for post-LSH/post-IVF candidate sets.

All arithmetic is cast to double and folded sequentially (index order)
so Spark and the DuckDB oracle produce bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    → (id, cos) ordered cos DESC, id ASC. The query vector is a literal
    array (broadcast inside the plan); scoring is one projection —
    .explain shows a single WholeStageCodegen scan + TakeOrderedAndProject.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(
        F.col(id_col).alias("id"),
        cosine(F.col(vec_col), q).alias("cos"),
    )
    return out.orderBy(F.col("cos").desc(), F.col("id").asc()).limit(k)


def centroids(df: DataFrame, bucket_col: str, vec_col: str) -> DataFrame:
    """(bucket, centroid array<double>) — mean vector per bucket.

    posexplode + groupBy(bucket, dim): the shuffle carries one double
    per (bucket, dim) after partial aggregation — tiny at any scale.
    """
    dims = (
        df.select(F.col(bucket_col).alias("bucket"), F.posexplode(_as_double(F.col(vec_col))))
        .groupBy("bucket", "pos")
        .agg(F.avg("col").alias("v"))
    )
    return (
        dims.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("bucket", F.transform(F.col("pv"), lambda s: s["v"]).alias("centroid"))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 1,
) -> DataFrame:
    """IVF-style ANN: probe the n_probe buckets whose centroids are
    closest (cosine) to the query, then exact top-k within them.

    The bucket filter is a pushed-down equality/IN predicate → partition
    pruning on a bucket-partitioned table. Recall < 1.0 by design; the
    brute-force path is the exactness oracle.
    """
    cents = centroids(df, bucket_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    best = [
        r["bucket"]
        for r in cents.select(
            "bucket", cosine(F.col("centroid"), q).alias("c")
        )
        .orderBy(F.col("c").desc(), F.col("bucket").asc())
        .limit(n_probe)
        .collect()
    ]
    pruned = df.where(F.col(bucket_col).isin(best))
    return brute_force_topk(pruned, id_col, vec_col, query_vec, k)


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """All-pairs (id_a < id_b, cos) with cos >= threshold.

    Normalizes each vector once, then a cross join with a codegen'd
    dot product. Use on candidate subsets (post-LSH / within-IVF-bucket)
    at scale; the normalize-first trick halves the flops.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: x / l2norm(_as_double(F.col(vec_col))),
        ).alias("nv"),
    )
    a = normed.select(F.col("id").alias("id_a"), F.col("nv").alias("nv_a"))
    b = normed.select(F.col("id").alias("id_b"), F.col("nv").alias("nv_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dot(F.col("nv_a"), F.col("nv_b")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
