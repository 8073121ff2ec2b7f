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


def train_ivf_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iter: int = 5,
) -> list[list[float]]:
    """Spherical k-means quantizer for IVF — the trained replacement
    for an externally supplied bucket column (round-3: bucket-mean
    centroids gave no recall knob when the buckets were arbitrary).

    Fully distributed Lloyd iterations: assignment is k codegen'd dot
    products per row against NORMALIZED driver-broadcast centroids
    (argmax over cosine ≡ argmax over dot once centroids are unit
    length — |v| is constant across a row's candidates); the update is
    the posexplode/groupBy mean from :func:`centroids` — the shuffle
    carries one double per (bucket, dim). Only k·dim doubles ever hit
    the driver per iteration, so the loop costs n_iter scans and works
    at any row count.

    Init is deterministic: the k seeds are the vectors whose md5(id)
    sort first — reproducible at any partitioning. Empty clusters keep
    their previous centroid. Returns unit-length centroids (index =
    bucket id) for :func:`assign_ivf_buckets` / :func:`ivf_topk_trained`.
    """
    import numpy as np

    df = df.where(l2norm(_as_double(F.col(vec_col))) > 0)
    seeds = (
        df.select(F.col(vec_col).alias("v"), F.md5(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    cents = np.asarray([[float(x) for x in r["v"]] for r in seeds], np.float64)
    if len(cents) == 0:
        return []
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)

    for _ in range(n_iter):
        assigned = df.withColumn(
            "_ivf_b", _argmax_bucket(F.col(vec_col), cents.tolist())
        )
        means = centroids(assigned, "_ivf_b", vec_col).collect()
        new = cents.copy()  # empty cluster → previous centroid survives
        for r in means:
            c = np.asarray(r["centroid"], np.float64)
            n = np.linalg.norm(c)
            if n > 0:
                new[int(r["bucket"])] = c / n
        if np.allclose(new, cents, atol=1e-12):
            break
        cents = new
    return cents.tolist()


def _argmax_bucket(v: Column, cents: list[list[float]]) -> Column:
    """Bucket id of the max-dot centroid (ties → lowest id). One
    codegen'd expression — array_max over (dot, -id) structs."""
    scored = F.array(
        *[
            F.struct(
                dot(_as_double(v), F.array(*[F.lit(float(c)) for c in cent])).alias("s"),
                F.lit(-i).alias("ni"),
            )
            for i, cent in enumerate(cents)
        ]
    )
    best = F.array_max(scored)
    return (-best["ni"]).cast("int")


def assign_ivf_buckets(
    df: DataFrame, vec_col: str, cents: list[list[float]], out_col: str = "ivf_bucket"
) -> DataFrame:
    """Attach the trained-quantizer bucket id — at 100 TB this column
    becomes the table's partition/cluster key so :func:`ivf_topk_trained`'s
    probe prunes at the Parquet/Iceberg manifest level."""
    return df.withColumn(out_col, _argmax_bucket(F.col(vec_col), cents))


def ivf_topk_trained(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 1,
    bucket_col: str | None = None,
) -> DataFrame:
    """IVF ANN with a trained quantizer: rank centroids against the
    query DRIVER-SIDE (k·dim flops — no Spark job), scan only the
    n_probe best buckets. With ``bucket_col`` naming a pre-assigned
    column the filter is a pushed-down IN predicate (partition pruning
    on a bucket-partitioned table); otherwise buckets are computed on
    the fly (one full-scan projection, still no shuffle). n_probe =
    len(cents) degenerates to exact brute force — the recall knob is
    measurable (tests sweep it).
    """
    import numpy as np

    if not len(cents):
        # train_ivf_centroids legitimately returns [] for an empty /
        # all-zero-vector input — no buckets means no candidates
        # (schema matches brute_force_topk's (id, cos))
        return df.sparkSession.createDataFrame([], "id long, cos double")
    c = np.asarray(cents, np.float64)
    q = np.asarray([float(x) for x in query_vec], np.float64)
    order = np.lexsort((np.arange(len(c)), -(c @ q)))
    best = [int(b) for b in order[: max(1, n_probe)]]
    if bucket_col is None:
        df = assign_ivf_buckets(df, vec_col, cents, "_ivf_b")
        bucket_col = "_ivf_b"
    pruned = df.where(F.col(bucket_col).isin(best))
    return brute_force_topk(pruned, id_col, vec_col, query_vec, k)


RP_N_PLANES = 16  # random hyperplanes for sign-LSH
RP_BAND_SIZE = 8  # 16 bits → 2 bands of 8


def _rp_weight(plane: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1), derived
    from md5 so the DuckDB oracle reproduces it bit-for-bit."""
    import hashlib

    h = int(hashlib.md5(f"rp:{plane}:{i}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def rp_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.8,
    dim: int | None = None,
    n_planes: int = RP_N_PLANES,
    band_size: int = RP_BAND_SIZE,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane (sign) LSH — the
    SCALE path that replaces :func:`cosine_pairs`' cross join.

    Each vector gets ``n_planes`` sign bits (dot with deterministic
    hyperplanes ≥ 0), grouped into bands; candidate pairs share at least
    one full band key (bucket join — |bucket|² work, never all pairs;
    AQE skew-join splits pathological buckets), then exact cosine ≥
    threshold verifies. Reported cosines are exact; recall < 1 by
    design (two bands of 8 bits ⇒ high recall only for high-cosine
    pairs — the near-duplicate regime). Bits/bands mirror the MinHash
    LSH design so the same DuckDB oracle strategy applies verbatim.
    """
    if dim is None:
        head = df.select(vec_col).first()
        if head is None:  # empty input → empty pairs, not a crash
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cos double"
            )
        dim = len(head[0])
    # zero vectors have no direction: they'd all share the all-ones sign
    # bucket and normalize to NaN cosines (which Spark orders ABOVE any
    # threshold) — drop them up front, mirrored in the SQL oracle
    df = df.where(l2norm(_as_double(F.col(vec_col))) > 0)
    v = _as_double(F.col(vec_col))
    bits = [
        (
            dot(v, F.array(*[F.lit(_rp_weight(p, i)) for i in range(dim)]))
            >= 0
        ).cast("int")
        for p in range(n_planes)
    ]
    n_bands = n_planes // band_size
    banded = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "",
                            *[
                                bits[bi * band_size + r].cast("string")
                                for r in range(band_size)
                            ],
                        ).alias("key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    normed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: x / l2norm(_as_double(F.col(vec_col))),
        ).alias("nv"),
    )
    return (
        cand.join(normed.select(F.col("id").alias("id_a"), F.col("nv").alias("nv_a")), "id_a")
        .join(normed.select(F.col("id").alias("id_b"), F.col("nv").alias("nv_b")), "id_b")
        .select("id_a", "id_b", dot(F.col("nv_a"), F.col("nv_b")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


COSINE_PAIRS_MAX_ROWS = 100_000  # ~5e9 pairs — the most a deliberate
# exact all-pairs run should ever attempt; past this the quadratic
# blow-up detonates any cluster and rp_lsh_pairs is the scale path


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    allow_quadratic: bool = False,
) -> DataFrame:
    """All-pairs (id_a < id_b, cos) with cos >= threshold.

    Normalizes each vector once, then a cross join with a codegen'd
    dot product. Use on candidate subsets (post-LSH / within-IVF-bucket)
    at scale; the normalize-first trick halves the flops.

    This is O(n^2): inputs above COSINE_PAIRS_MAX_ROWS rows are
    refused (the count is cheap next to the cross join it prevents)
    unless ``allow_quadratic=True``. For large inputs use
    :func:`rp_lsh_pairs`, which bands sign-LSH keys so the join only
    touches colliding buckets.
    """
    if not allow_quadratic:
        # limit(N+1).count() bounds the check at N+1 rows scanned
        n = df.limit(COSINE_PAIRS_MAX_ROWS + 1).count()
        if n > COSINE_PAIRS_MAX_ROWS:
            raise ValueError(
                f"cosine_pairs input exceeds {COSINE_PAIRS_MAX_ROWS} rows; "
                f"the all-pairs cross join is quadratic. Use rp_lsh_pairs "
                f"for large inputs, or pass allow_quadratic=True if this "
                f"is a deliberate candidate-subset run."
            )
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


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``(id, scale, q)`` with
    ``scale = max|v| / 127`` and ``q_i = floor(v_i/scale + 0.5)``
    (⇒ |q_i| <= 127 by construction; a zero vector gets scale 0 and
    all-zero codes). Dequantize as ``q_i * scale`` with per-component
    error <= scale/2.

    Pure Catalyst array expressions — no UDF. At 100 TB the embedding
    column dominates ANN storage and shuffle: int8 codes plus one
    float64 scale per vector cut that IO ~4x, and the IVF/LSH candidate
    stages in this module work unchanged on dequantized values. The
    arithmetic is float-deterministic (same IEEE ops both engines), so
    the SQL oracle reproduces the codes exactly.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(
        F.col(id_col).alias("id"),
        v.alias("_v"),
        F.array_max(F.transform(v, F.abs)).alias("_amax"),
    )
    scale = F.col("_amax") / F.lit(127.0)
    q = F.when(
        F.col("_amax") == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.greatest(
                F.lit(-127).cast("long"),
                F.least(
                    F.lit(127).cast("long"),
                    F.floor(x / scale + F.lit(0.5)).cast("long"),
                ),
            ),
        )
    )
    return out.select("id", scale.alias("scale"), q.alias("q"))
