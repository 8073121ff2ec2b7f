"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (designed for 10^9+ documents):

- Exact dedup is one hash-groupBy — a single shuffle on a 16-byte key.
- MinHash signatures are computed in one explode + groupBy(doc) pass;
  the LSH band join groups docs by (band_idx, band_key) so candidate
  generation never compares non-colliding docs (the all-pairs cross
  join is replaced by |bucket|^2 local joins; AQE skew-join splits any
  pathological bucket).
- n-gram Jaccard candidates come from an inverted shingle→doc join
  (docs sharing at least one shingle), again avoiding the cross join.
- SimHash is one groupBy(doc) with per-bit conditional sums.

All hashing is md5-based (identical in Spark and DuckDB) so every op
has an exact SQL oracle; all arithmetic stays in int64 (products are
bounded: hash is reduced mod 2^31 before the (a*h+b) mod P permutation
with a,b < 2^20, so a*h < 2^51).

No Python UDFs anywhere — pure Catalyst expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_PATTERN = "[a-z0-9]+"

# Deterministic MinHash permutation constants (a, b) — shared verbatim
# with the DuckDB oracle SQL. P is a prime > 2^32; hashes are reduced
# mod 2^31 first so a*h + b stays far inside int64.
MINHASH_P = 4294967311
MINHASH_PERMS = [
    (745291, 283733), (912269, 613321), (530501, 875983), (700919, 121339),
    (337411, 990037), (811073, 445133), (478139, 220301), (655243, 777239),
    (390043, 568019), (941083, 332489), (574601, 109943), (868411, 690407),
    (259631, 820103), (736007, 254893), (498221, 938431), (623869, 412007),
]
LSH_ROWS_PER_BAND = 4  # 16 hashes → 4 bands × 4 rows


def tokens(col: str | Column, pattern: str = TOKEN_PATTERN) -> Column:
    """lowercase word tokens as array<string> (JVM regexp, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), 0)


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative int64 — the one hash
    primitive shared with the SQL oracle (DuckDB:
    ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles as space-joined strings; < n tokens → empty."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(1, n + 1)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, canonical: bool = True
) -> DataFrame:
    """Exact duplicate groups → (fp, keep_id, n_dups).

    ``canonical=True`` fingerprints the sorted distinct token set (order/
    duplication-insensitive); ``False`` hashes the raw text. keep_id is
    the smallest doc id of the group (the survivor).
    """
    if canonical:
        key = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col)))))
    else:
        key = F.md5(F.col(text_col))
    return (
        df.select(key.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dups"),
        )
    )


def _shingle_df(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct — the exploded shingle inventory."""
    return (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
        .select("id", F.explode(word_shingles(F.col("toks"), n)).alias("shingle"))
        .distinct()
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(id, mh_0 .. mh_{K-1}) MinHash signature over word shingles.

    One explode + one groupBy(id): the K permutations are column
    expressions over a single md5 hash, combined map-side (partial
    min aggregation) — the shuffle carries K longs per doc.
    Docs with no shingles are dropped (no signature).
    """
    sh = _shingle_df(df, id_col, text_col, shingle_n)
    h = md5_long(F.col("shingle")) % F.lit(2**31)
    perms = [
        ((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"p{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    expanded = sh.select("id", *perms)
    return expanded.groupBy("id").agg(
        *[F.min(f"p{j}").alias(f"mh_{j}") for j in range(len(MINHASH_PERMS))]
    )


def _lsh_bands(sig: DataFrame) -> DataFrame:
    """(id, band, key) — one row per doc per LSH band, key = md5 of the
    band's minhash row values. Shared by pair generation and the skew
    diagnostics so the two always see the same bucketing."""
    k = len(MINHASH_PERMS)
    n_bands = k // LSH_ROWS_PER_BAND
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh_{bi * LSH_ROWS_PER_BAND + r}")
                                    for r in range(LSH_ROWS_PER_BAND)
                                ],
                            )
                        ).alias("key"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_bucket_stats(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """Bucket-size skew table for the LSH band join: one row per
    bucket size with (bucket_size, n_buckets, cand_pairs) where
    cand_pairs = n_buckets · size·(size−1)/2 — the candidate pairs the
    clique join would generate at that size. Hot (band, key) groups on
    duplicate-heavy corpora are this pipeline's hot terms; this is the
    measurement behind ``max_bucket_size``."""
    sig = minhash_signature(df, id_col, text_col, shingle_n)
    return (
        _lsh_bands(sig)
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
        .select(
            "bucket_size",
            "n_buckets",
            (
                F.col("n_buckets")
                * F.col("bucket_size")
                * (F.col("bucket_size") - 1)
                / 2
            ).cast("long").alias("cand_pairs"),
        )
        .orderBy(F.col("bucket_size").desc())
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    → (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    Candidates = docs sharing any LSH band key; verification joins the
    exact shingle sets (only for candidates, never all pairs).

    ``max_bucket_size`` is the skew guard for duplicate-heavy corpora:
    a (band, key) bucket of B docs contributes B(B−1)/2 clique
    candidates — a 100k-strong duplicate family (the shape that
    actually produces huge buckets) would be 5·10^9 pairs through one
    task. With the cap set, buckets LARGER than the cap contribute a
    STAR (each member paired with the bucket's minimum id, B−1 pairs)
    instead of the clique: linear in B, and — unlike a sorted chain,
    whose diameter would make :func:`connected_components`' min-label
    pass take B rounds — the star has diameter 2, so the full
    duplicate CLUSTER is recovered in one propagation round whenever
    hub pairs verify (true by construction for the duplicate families
    that cause hot buckets; a hot bucket mixing genuinely dissimilar
    docs loses only pairs the verify would mostly have rejected
    anyway). PAIR-level recall inside hot buckets is therefore reduced
    by design — cluster-level dedup recall is the preserved property.
    ``None`` (default) keeps exact clique semantics (the gate
    oracle's shape).
    """
    sig = minhash_signature(df, id_col, text_col, shingle_n)
    bands = _lsh_bands(sig)
    if max_bucket_size is not None:
        from pyspark.sql import Window

        wsz = Window.partitionBy("band", "key")
        b2 = bands.select(
            "id", "band", "key",
            F.count("*").over(wsz).alias("_bsz"),
            F.min("id").over(wsz).alias("_hub"),
        )
        small = b2.where(F.col("_bsz") <= int(max_bucket_size)).select(
            "id", "band", "key"
        )
        clique = (
            small.alias("x")
            .join(small.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        )
        star = (
            b2.where(
                (F.col("_bsz") > int(max_bucket_size))
                & (F.col("id") != F.col("_hub"))
            )
            # _hub = min(id) over the bucket, so id_a < id_b holds
            .select(F.col("_hub").alias("id_a"), F.col("id").alias("id_b"))
        )
        cand = clique.unionByName(star).distinct()
    else:
        cand = (
            bands.alias("x")
            .join(bands.alias("y"), ["band", "key"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
    sh = _shingle_df(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    common = (
        cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("shingle")),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_n: int = 1,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard pairs >= threshold (id_a < id_b).

    Candidate pairs come from the inverted shingle→doc join (docs must
    share >= 1 shingle), so candidate cost is Σ_shingle df(shingle)² —
    quadratic in the hottest shingle's frequency. ``max_shingle_df``
    caps that: shingles seen in more than that many docs are excluded
    from CANDIDATE GENERATION (standard prefix-filter practice — a
    near-universal shingle carries no similarity signal but dominates
    Σ df²), bounding candidates at Σ min(df, cap)². Verification then
    counts common shingles over the FULL sets, so reported jaccard
    values are exact; the only approximation is that a pair sharing
    nothing but capped-hot shingles is not emitted. ``None`` (default)
    keeps the fully exact single-pass plan. At web scale set the cap
    (e.g. 10_000) or pre-filter with :func:`minhash_lsh_pairs`.
    """
    sh = _shingle_df(df, id_col, text_col, shingle_n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if max_shingle_df is not None:
        rare = sh.join(
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= int(max_shingle_df))
            .select("shingle"),
            "shingle",
        )
        cand = (
            rare.select(F.col("id").alias("id_a"), "shingle")
            .join(rare.select(F.col("id").alias("id_b"), "shingle"), "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        common = (
            cand.join(sh.withColumnRenamed("id", "id_a"), "id_a")
            .join(
                sh.select(F.col("id").alias("id_b"), F.col("shingle")),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("common"))
        )
    else:
        common = (
            sh.select(F.col("id").alias("id_a"), "shingle")
            .join(sh.select(F.col("id").alias("id_b"), "shingle"), "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("common"))
        )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def contamination_flags(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 3,
    min_shared: int = 2,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing n-gram
    content with an evaluation set.

    Returns ``(id, n_shared, n_bench_docs, contaminated)`` — one row
    per corpus doc that shares >= 1 distinct ``shingle_n``-gram with
    any benchmark doc: ``n_shared`` = distinct shared shingles (over
    all bench docs), ``n_bench_docs`` = distinct bench docs touched,
    ``contaminated`` = n_shared >= ``min_shared``. Docs sharing
    nothing are absent (a left-join + coalesce(0) reinstates them if
    a total table is needed — cheaper left as the caller's choice).

    This is the ASYMMETRIC sibling of :func:`ngram_jaccard_pairs`
    (dedup wants corpus×corpus pairs; decontamination wants corpus
    vs a reference set). The scale shape exploits the asymmetry: an
    eval set is tiny next to a 100 TB corpus, so its distinct-shingle
    inventory broadcasts (``broadcast_bench``, default) and the
    corpus side streams through a broadcast hash join — the big side
    is never shuffled. Set ``broadcast_bench=False`` for an
    unusually large reference set (falls back to a shuffle join on
    the shingle key).
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1 (got {min_shared})")
    # corpus side: exploded WITHOUT the _shingle_df .distinct() — that
    # distinct is a full-corpus-width shuffle, and the countDistinct
    # aggregations below are duplicate-insensitive, so the big side
    # really never shuffles before the broadcast join (per-doc
    # array_distinct dedups within a row for free, cutting join
    # multiplicity without any exchange)
    corpus_sh = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    ).select(
        "id",
        F.explode(
            F.array_distinct(word_shingles(F.col("toks"), shingle_n))
        ).alias("shingle"),
    )
    bench_sh = _shingle_df(
        bench_df, bench_id_col, bench_text_col, shingle_n
    ).withColumnRenamed("id", "bench_id")
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    return (
        corpus_sh.join(bench_sh, "shingle")
        .groupBy("id")
        .agg(
            F.countDistinct("shingle").alias("n_shared"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .select(
            "id",
            "n_shared",
            "n_bench_docs",
            (F.col("n_shared") >= int(min_shared)).alias("contaminated"),
        )
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = 16
) -> DataFrame:
    """(id, simhash) — tf-weighted SimHash over word tokens.

    bit_i(doc) = 1 iff Σ_term tf · (2·bit_i(h(term)) − 1) > 0.
    One explode + one groupBy(id) with n_bits conditional sums; the
    per-bit test uses only shifts/mod on the shared md5-int64 hash.
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    tf = (
        toks.select("id", F.explode("toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", md5_long(F.col("term")))
    )
    bit_sums = [
        F.sum(
            F.col("tf")
            * (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{i}")
        for i in range(n_bits)
    ]
    agg = tf.groupBy("id").agg(*bit_sums)
    sh = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"s{i}") > 0, F.lit(2**i)).otherwise(F.lit(0)),
        range(1, n_bits),
        F.when(F.col("s0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return agg.select("id", sh.cast("long").alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, cluster_id) over the similarity graph: cluster_id = the
    MINIMUM doc id reachable from ``id`` — the step that turns near-dup
    PAIRS (minhash_lsh_pairs / ngram_jaccard_pairs / rp_lsh_pairs
    output) into dedup groups a keep-one policy can act on.

    Min-label propagation: every vertex starts labeled with itself;
    each round a vertex adopts the minimum label among itself and its
    neighbors; fixpoint = components. Each round is one join + one
    groupBy, both hash-partitioned on the vertex id, so at 10^9+ edges
    a round is a single co-partitioned shuffle; `localCheckpoint`
    truncates the lineage so the plan doesn't grow with rounds, and the
    driver sees one change-count per round. Rounds needed = component
    DIAMETER, and near-dup components are dense (dup groups, short
    chains), so convergence is typically 2-5 rounds — the pathological
    long-path graph is not the dedup shape. Raises after ``max_iter``
    rounds rather than returning a non-converged (wrong) labeling.

    Only vertices that appear in some pair are emitted; singleton docs
    are their own cluster by definition (callers left-join and coalesce
    to the doc's own id).
    """
    e = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
    )
    labels = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.src == labels.id)
            .select(F.col("dst").alias("id"), "lbl")
            .groupBy("id")
            .agg(F.min("lbl").alias("nlbl"))
        )
        updated = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
                (F.coalesce("nlbl", "lbl") < F.col("lbl")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.where(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            return labels.select("id", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every near-duplicate except the minimum-id doc of each
    cluster — rows not in any pair survive untouched. One broadcast-or-
    shuffled left join against the (small) component table."""
    comp = connected_components(pairs, id_a, id_b).select(
        # temp names: drop-by-name would otherwise remove the caller's
        # own 'id'/'cluster_id' columns (drop("id") drops EVERY column
        # with that name, including df's)
        F.col("id").alias("_cc_id"),
        F.col("cluster_id").alias("_cc_cluster"),
    )
    return (
        df.join(comp, df[id_col] == comp["_cc_id"], "left")
        .where(
            F.col("_cc_cluster").isNull() | (F.col("_cc_cluster") == df[id_col])
        )
        .drop("_cc_id", "_cc_cluster")
    )
