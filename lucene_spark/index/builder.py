"""Distributed inverted-index build (the Spark re-architecture of the
reference's Writer/DocumentWriter/SegmentMerger pipeline).

Shape of the build (designed for 10^12 turns / 1000 executors; tested on
local[32]):

1. ``assign_doc_ids`` — dense global docIDs by (conv_id, turn_idx)
   WITHOUT a single-partition window: repartitionByRange + per-partition
   counts collected to the driver (S integers) + offset-shifted local
   row numbers. Reference docID semantics: insertion order
   (src/Index.php:866-873,944-949); here insertion order IS the stable
   (conv_id, turn_idx) ordering demanded by the input contract.

2. Phase A (segments ≙ reference segment flush, DocumentWriter.php):
   docs are bucketed into doc-range-disjoint segments
   (``seg_id = doc_id // seg_size``); each segment is inverted locally
   inside one ``applyInPandas`` task — tokenize (vectorized), group by
   (field, term), pack posting blocks of ≤128 docs as delta+varbyte
   BINARY columns with per-block metadata (max_docid, block_max_tf,
   block_min_dl) ≙ the reference's ``.frq``/``.prx`` streams plus the
   skip/block-max extension the north rule asks for (the reference
   declares but never writes skip data — AbstractSegmentWriter.php:33-57).
   Per-doc field length (dl) is packed into each block so BM25 scoring
   never joins the docs table. Each chunk of segments commits a manifest
   row (lineage + token/posting counts) — a killed build resumes by
   skipping segments whose manifest row exists.

3. Phase B (merge ≙ SegmentMerger k-way merge, SegmentMerger.php:202-245):
   because segments are doc-range DISJOINT, merging posting blocks is a
   pure SORT — ``repartitionByRange(field, term, doc_base)`` +
   ``sortWithinPartitions`` — with NO groupBy over postings at all.
   Spark's range partitioner samples keys, so a hot term's blocks
   (stop-word-scale: 10^10+ postings) automatically SPLIT across
   consecutive partitions at (term, doc_base) boundaries — this is the
   "salted repartition for hot-term skew" of the north rule, with
   per-salt docID ranges disjoint by construction so concatenation needs
   no re-sort. The term dictionary aggregates only tiny per-segment
   (df, cf) counters (groupBy on (field, term) of S rows/term, never
   posting-sized data).

Storage layout under ``index_dir``::

    docs/        doc_id + stored cols + len_<f>/norm_<f> per text field
    postings/    field, term, seg_id, block_id, doc_base, max_docid,
                 n, block_max_tf, block_min_dl, cf, docs_bin, tfs_bin,
                 dls_bin, pos_bin   (sorted by field, term, doc_base)
    term_dict/   field, term, df, cf, n_blocks, max_tf
    manifests/   seg_id, n_docs, n_postings, lineage, per-field token sums
    stats.json   n_docs, per-field {sum_len, n_docs_with_field}, config
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_spark.analysis import Analyzer, default_analyzer
from lucene_spark.codec.norms import encode_norm_array, length_norm
from lucene_spark.codec.varbyte import vb_encode, vb_encode_sliced

BLOCK_SIZE = 128  # docs per posting block ≙ reference indexInterval
# (AbstractSegmentWriter.php:30)
BLOCK_DOC_RANGE = 8192  # max doc-id span per block: sparse terms split
# at range boundaries so block-max bounds stay doc-local (see
# _invert_segment packing comment)
WAND_SUBS = int(os.environ.get("LUCENE_SPARK_WAND_SUBS", "4"))
# sub-range summaries per posting block (32 postings each at full
# blocks): per-sub (doc span, Pareto frontier) ceilings localize WAND
# bounds below block granularity. Env-tunable: 1 disables sub-range
# granularity (blocks become their own single sub-range) and shrinks
# the nested metadata columns for write-heavy workloads.
MAX_BUILD_CHUNKS = 512  # cap on serial resume-chunk jobs in phase A


@dataclass
class IndexConfig:
    # field -> 'text' | 'keyword' | 'stored'
    field_policy: dict[str, str] = dc_field(
        default_factory=lambda: {
            "text": "text",
            "conv_id": "keyword",
            "role": "keyword",
            "tool": "keyword",
        }
    )
    analyzer: Analyzer = dc_field(default_factory=default_analyzer)
    seg_size: int = 100_000  # docs per segment
    segments_per_commit: int = 64  # manifest checkpoint granularity
    store_positions: bool = True
    merge_partitions: int | None = None  # default: shuffle.partitions
    # index-time boosts, folded into the norm byte exactly like the
    # reference: norm = lengthNorm · docBoost · fieldBoost
    # (DocumentWriter.php:106-109, Document.php:16-32, Document/Field.php)
    field_boosts: dict[str, float] = dc_field(default_factory=dict)
    doc_boost_col: str | None = None  # input column with per-doc boost


POSTINGS_SCHEMA = StructType(
    [
        StructField("field", StringType()),
        StructField("term", StringType()),
        StructField("seg_id", LongType()),
        StructField("block_id", LongType()),
        StructField("doc_base", LongType()),
        StructField("max_docid", LongType()),
        StructField("n", IntegerType()),
        StructField("block_max_tf", IntegerType()),
        StructField("block_min_dl", IntegerType()),
        # Pareto-optimal (tf, dl) impact pairs of the block's docs —
        # no doc has higher tf AND lower dl than a stored pair. The
        # true block score bound is max over pairs of partial(tf, dl),
        # far tighter than partial(max_tf, min_dl), which combines one
        # doc's tf with ANOTHER doc's dl (Lucene's impacts idea).
        # Evaluated lazily at query time because partial() depends on
        # avgdl. Typically 1-5 pairs (tf values cluster at 1-3).
        StructField("imp_tfs", ArrayType(IntegerType())),
        StructField("imp_dls", ArrayType(IntegerType())),
        # Sub-range summaries: the block's postings split into
        # WAND_SUBS equal runs, each with its own doc span and its own
        # Pareto (tf, dl) frontier — the sub-range's EXACT max impact
        # for any monotone scorer, not a (max_tf, min_dl) mix of
        # different docs (with log-normal doc lengths nearly every
        # 32-posting run contains one short doc, so the mixed bound
        # stays uniformly high and prunes nothing). Cross-term WAND
        # bounds computed from these localize a block's impact to the
        # sub-range that actually holds it — a single high-impact doc
        # no longer smears the block's bound over its whole 8192-doc
        # span, which is what made uniform-impact OR disjunctions
        # unprunable at block granularity.
        StructField("sub_min_docs", ArrayType(LongType())),
        StructField("sub_max_docs", ArrayType(LongType())),
        StructField("sub_imp_tfs", ArrayType(ArrayType(IntegerType()))),
        StructField("sub_imp_dls", ArrayType(ArrayType(IntegerType()))),
        StructField("cf", LongType()),
        StructField("docs_bin", BinaryType()),
        StructField("tfs_bin", BinaryType()),
        StructField("dls_bin", BinaryType()),
        StructField("pos_bin", BinaryType()),
    ]
)


def _emit_len_norm_cols(
    pdf: pd.DataFrame,
    out: pd.DataFrame,
    analyzer: Analyzer,
    text_fields: list[str],
    kw_fields: list[str],
    field_boosts: dict[str, float],
    doc_boost_col: str | None,
    length_norm_fn=None,
) -> pd.DataFrame:
    """Shared Arrow-kernel body: len_<f> (surviving-token count) and
    norm_<f> (quantized byte of lengthNorm·docBoost·fieldBoost —
    DocumentWriter.php:106-109; keyword lengthNorm(1)=1).
    ``length_norm_fn`` is the pluggable Similarity lengthNorm hook,
    captured driver-side by the caller (default: the reference
    1/sqrt(n))."""
    ln_fn = length_norm_fn or length_norm
    if doc_boost_col:
        if doc_boost_col not in pdf.columns:
            raise ValueError(
                f"doc_boost_col {doc_boost_col!r} is not a column of the "
                f"input (have: {sorted(pdf.columns)})"
            )
        # null boost → neutral 1.0 (NaN would silently corrupt the norm)
        doc_boost = (
            pdf[doc_boost_col].astype(float).fillna(1.0).to_numpy(np.float64)
        )
    else:
        doc_boost = np.float64(1.0)

    def field_boost(f: str):
        # per-(doc, field) boost column ``boost_<f>`` (≙ the reference's
        # per-Field-instance boost, Document/Field.php:18-113) composed
        # with the static per-field config boost
        fb = np.float64(field_boosts.get(f, 1.0))
        col = f"boost_{f}"
        if col in pdf.columns:
            return pdf[col].astype(float).fillna(1.0).to_numpy(np.float64) * fb
        return fb

    for f in text_fields:
        lens = analyzer.count_series(pdf[f])
        norms = encode_norm_array(
            np.asarray(ln_fn(lens), np.float64) * doc_boost * field_boost(f)
        )
        # empty tokenized field → not indexed → norm byte 0
        # (reference: DocumentWriter.php:101-104, missing-field norm)
        norms = np.where(lens == 0, 0, norms)
        out[f"len_{f}"] = lens
        out[f"norm_{f}"] = norms.astype(np.int32)
    for f in kw_fields:
        present = pdf[f].notna().to_numpy()
        vals = (
            np.full(len(pdf), float(ln_fn(1)), np.float64)
            * field_boost(f)
            * doc_boost
        )
        norms = encode_norm_array(vals)
        out[f"len_{f}"] = present.astype(np.int64)
        out[f"norm_{f}"] = np.where(present, norms, 0).astype(np.int32)
    return out


def assign_doc_ids(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    cfg: "IndexConfig | None" = None,
) -> DataFrame:
    """Dense 0-based doc_id by ``order_cols`` without a global window.

    Scale note: a naive ``row_number() over (order by ...)`` collapses to
    ONE partition. Here: range-repartition on the order columns (global
    sort boundaries), count rows per partition (a tiny collect of S
    longs), then add the per-partition offset to a local row number —
    every step is fully parallel.

    When ``cfg`` is given, the same Arrow pass also emits len_<f> /
    norm_<f> columns for the config's indexed fields (fused
    _docs_with_lengths — avoids a second full-data Python round trip).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ordered = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *order_cols
    )
    ordered = ordered.withColumn("_pid", F.spark_partition_id())
    # persist: the range partitioner SAMPLES to pick boundaries — the
    # count job and the id job must see the SAME partitioning, so pin it
    ordered = ordered.persist()
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_b = spark.sparkContext.broadcast(offsets)

    text_fields = (
        [f for f, k in cfg.field_policy.items() if k == "text" and f in df.columns]
        if cfg
        else []
    )
    kw_fields = (
        [f for f, k in cfg.field_policy.items() if k == "keyword" and f in df.columns]
        if cfg
        else []
    )
    analyzer = cfg.analyzer if cfg else None
    extra_fields = [StructField("doc_id", LongType(), False)]
    for f in text_fields + kw_fields:
        extra_fields.append(StructField(f"len_{f}", LongType()))
        extra_fields.append(StructField(f"norm_{f}", IntegerType()))
    schema = StructType(ordered.schema.fields + extra_fields)

    # similarity lengthNorm resolved on the DRIVER and captured into
    # the kernel closure (workers must not re-resolve the default);
    # lazy import — search/__init__ imports executor imports builder
    from lucene_spark.search.similarity import get_default

    ln_fn = get_default().length_norm

    # mapInPandas may split a partition into several Arrow batches; the
    # running offset must persist across batches within one partition
    def add_ids(it):
        seen = 0
        base = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets_b.value[int(pdf["_pid"].iloc[0])]
            out = pdf.assign(
                doc_id=np.arange(seen, seen + len(pdf), dtype=np.int64) + base
            )
            seen += len(pdf)
            yield _emit_len_norm_cols(
                pdf, out, analyzer, text_fields, kw_fields,
                cfg.field_boosts if cfg else {},
                cfg.doc_boost_col if cfg else None,
                length_norm_fn=ln_fn,
            )

    out = ordered.mapInPandas(add_ids, schema).drop("_pid")
    out._lucene_pinned = ordered  # builder unpersists after consuming
    out._lucene_n_docs = acc  # ids are dense 0..acc-1 (see dense path)
    return out


def assign_doc_ids_dense(
    df: DataFrame,
    conv_col: str,
    turn_col: str,
    cfg: "IndexConfig | None" = None,
    broadcast_max_convs: int = 1_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense doc_id by (conv, turn) WITHOUT shuffling the full table.

    The range-exchange path (:func:`assign_doc_ids`) samples, sorts,
    persists and re-reads the whole input — measured as the worst-scaling
    phase of the build. Transcripts allow a much cheaper scheme:

    1. conv-size table ``(conv_id, cnt, min_turn, max_turn)`` — one
       narrow aggregation (bytes per conversation, not per turn);
    2. distributed prefix-sum over conv sizes ordered by conv_id:
       range-partition the conv TABLE (tiny fraction of the data),
       collect only per-partition sums (S longs) to the driver, shift
       local cumulative sums — the same offset trick as assign_doc_ids
       but over conversations, so it scales to 10^10 conversations;
    3. ``doc_id = conv_base + turn_idx`` when every conversation's
       turn_idx is dense 0..cnt-1 (the input contract's stable
       ordering); otherwise fall back to a per-conversation
       ``row_number`` window (parallel — partitioned by conv_id).
    4. the conv_base join broadcasts below ``broadcast_max_convs``
       (zero shuffle of the big table), else shuffle-hash-joins on
       conv_id.

    Produces exactly ``row_number() over (order by conv, turn) - 1``.
    With ``cfg``, also emits len_<f>/norm_<f> in the same Arrow pass.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    conv = df.groupBy(conv_col).agg(
        F.count("*").alias("_cnt"),
        F.min(turn_col).alias("_mn"),
        F.max(turn_col).alias("_mx"),
        F.countDistinct(turn_col).alias("_nd"),
    )
    ordered = (
        conv.repartitionByRange(n, conv_col)
        .sortWithinPartitions(conv_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    part_stats = (
        ordered.groupBy("_pid")
        .agg(
            F.sum("_cnt").alias("rows"),
            F.count("*").alias("convs"),
            # dense iff turn_idx is exactly the multiset {0..cnt-1}:
            # min==0 and max==cnt-1 alone admit duplicates+holes like
            # [0,1,1,3]; countDistinct==cnt makes the test sufficient
            F.sum(
                (
                    (F.col("_mn") == 0)
                    & (F.col("_mx") == F.col("_cnt") - 1)
                    & (F.col("_nd") == F.col("_cnt"))
                ).cast("long")
            ).alias("dense"),
        )
        .collect()
    )
    offsets, acc = {}, 0
    n_convs, n_dense = 0, 0
    for r in sorted(part_stats, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["rows"]
        n_convs += r["convs"]
        n_dense += r["dense"]
    all_dense = n_dense == n_convs
    offsets_b = spark.sparkContext.broadcast(offsets)

    def cumsum_bases(it):
        local = 0
        base0 = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if base0 is None:
                base0 = offsets_b.value[int(pdf["_pid"].iloc[0])]
            c = pdf["_cnt"].to_numpy(np.int64)
            ends = np.cumsum(c)
            pdf = pdf.assign(_base=base0 + local + ends - c)
            local += int(ends[-1])
            yield pdf[[conv_col, "_base"]]

    bases = ordered.mapInPandas(
        cumsum_bases,
        StructType(
            [
                next(f for f in conv.schema.fields if f.name == conv_col),
                StructField("_base", LongType(), False),
            ]
        ),
    )
    if n_convs <= broadcast_max_convs:
        bases = F.broadcast(bases)
    joined = df.join(bases, conv_col)
    if all_dense:
        with_id = joined.withColumn(
            "doc_id", (F.col("_base") + F.col(turn_col)).cast("long")
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy(conv_col).orderBy(turn_col)
        with_id = joined.withColumn(
            "doc_id", (F.col("_base") + F.row_number().over(w) - 1).cast("long")
        )
    with_id = with_id.drop("_base")
    if cfg is None:
        with_id._lucene_pinned = ordered
        with_id._lucene_n_docs = acc
        return with_id
    out = _docs_with_lengths(with_id, cfg)
    out._lucene_pinned = ordered
    # ids are dense 0..acc-1, so the caller needs no max(doc_id)
    # aggregation over the written table (one full-scan job saved)
    out._lucene_n_docs = acc
    return out


def pareto_impacts(t: np.ndarray, dl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pareto frontier of a block's (tf, dl) pairs: no doc has higher tf
    AND lower dl than a returned pair, so for ANY monotone impact
    function (increasing in tf, decreasing in dl — BM25's partial for
    every k1/b/avgdl) the block's true max impact is attained on the
    frontier. Sorted tf-descending."""
    po = np.lexsort((dl, -t))
    pt, pd_ = t[po], dl[po]
    # keep iff dl strictly below every dl at >= tf (equal-tf runs keep
    # their min-dl head; equal-dl lower-tf pairs are dominated)
    keep_mask = np.empty(len(pt), dtype=bool)
    keep_mask[0] = True
    keep_mask[1:] = pd_[1:] < np.minimum.accumulate(pd_)[:-1]
    return pt[keep_mask], pd_[keep_mask]


def _invert_segment(cfg: IndexConfig):
    """applyInPandas kernel: one segment's docs → packed posting blocks.

    All numpy over flattened token arrays — no per-row Python in the
    inner loops beyond regex findall (C-looped by pandas).
    """
    analyzer = cfg.analyzer
    policy = cfg.field_policy
    store_pos = cfg.store_positions

    def invert(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        pdf = pdf.sort_values("doc_id")
        doc_ids_all = pdf["doc_id"].to_numpy(np.int64)
        out_rows = []
        sing_frames: list[pd.DataFrame] = []
        for fname, kind in policy.items():
            if kind == "stored" or fname not in pdf.columns:
                continue
            if kind == "keyword":
                vals = pdf[fname]
                mask = vals.notna().to_numpy()
                terms = vals[mask].astype(str).to_numpy(dtype=object)
                docs = doc_ids_all[mask]
                tfs = np.ones(len(docs), dtype=np.int64)
                dls = np.ones(len(docs), dtype=np.int64)
                pos = np.zeros(len(docs), dtype=np.int64)  # position 0
                # (reference: keyword term at position 0, DocumentWriter.php:116-132)
            else:
                tok_lists = analyzer.tokenize_series(pdf[fname])
                lens = tok_lists.map(len).to_numpy(np.int64)
                if lens.sum() == 0:
                    continue
                row_idx = np.repeat(np.arange(len(pdf)), lens)
                terms = np.concatenate(
                    [np.asarray(x, dtype=object) for x in tok_lists if x]
                )
                ends = np.cumsum(lens)
                starts = ends - lens
                positions = (
                    np.arange(ends[-1], dtype=np.int64)
                    - np.repeat(starts, lens)
                    + 1
                )
                docs = doc_ids_all[row_idx]
                dls = lens[row_idx]  # per-token doc length (field len)
                tfs = None  # computed after grouping
                pos = positions

            if len(docs) == 0:
                continue
            if kind == "keyword":
                # one token per doc; group by term
                order = np.lexsort((docs, terms.astype(str)))
                g_terms, g_docs, g_tfs, g_dls, g_pos = (
                    terms[order],
                    docs[order],
                    tfs[order],
                    dls[order],
                    pos[order].astype(np.int64),
                )
                pos_counts = g_tfs
            else:
                # sort by (term, doc, position) then collapse equal
                # (term, doc) runs into tf counts
                t_str = terms.astype(str)
                order = np.lexsort((pos, docs, t_str))
                t_s, d_s, p_s, dl_s = (
                    t_str[order],
                    docs[order],
                    pos[order],
                    dls[order],
                )
                new_run = np.empty(len(t_s), dtype=bool)
                new_run[0] = True
                new_run[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
                run_ids = np.cumsum(new_run) - 1
                run_starts = np.flatnonzero(new_run)
                g_terms = t_s[run_starts]
                g_docs = d_s[run_starts]
                g_dls = dl_s[run_starts]
                g_tfs = np.bincount(run_ids).astype(np.int64)
                g_pos = p_s  # all positions, concatenated per (term, doc)
                pos_counts = g_tfs

            # block packing: for each term, split its postings into
            # blocks of <= BLOCK_SIZE docs, ALSO splitting at
            # BLOCK_DOC_RANGE doc-id boundaries. The range split is what
            # makes block metadata LOCAL for sparse terms: 128
            # consecutive postings of a rare term can span millions of
            # doc ids, smearing its WAND bound over every cross-term
            # bucket it touches; capping the doc span keeps bounds (and
            # conjunction range pruning) aligned to doc locality at the
            # cost of a few extra metadata rows for sparse terms
            # (at most one block per occupied range).
            term_change = np.empty(len(g_terms), dtype=bool)
            term_change[0] = True
            term_change[1:] = g_terms[1:] != g_terms[:-1]
            term_starts = np.flatnonzero(term_change)
            run_lens = np.diff(np.append(term_starts, len(g_terms)))
            idx_in_term = np.arange(len(g_terms)) - np.repeat(term_starts, run_lens)
            block_of = idx_in_term // BLOCK_SIZE
            range_of = g_docs // BLOCK_DOC_RANGE
            blk_change = (
                term_change
                | (np.diff(np.append(-1, block_of)) != 0)
                | (np.diff(np.append(range_of[0] - 1, range_of)) != 0)
            )
            blk_ids = np.cumsum(blk_change) - 1
            blk_starts = np.flatnonzero(blk_change)
            blk_ends = np.append(blk_starts[1:], len(g_terms))
            # positions offsets per (term,doc) run
            pos_ends = np.cumsum(pos_counts)
            pos_starts = pos_ends - pos_counts

            # whole-segment stream encoding: varbyte is per-value
            # independent, so each stream encodes ONCE and slices at
            # block boundaries (byte-identical to per-block encoding —
            # the first doc gap of a block is always 1 because the
            # stored doc_base is d[0] and decode subtracts the first
            # gap back out). Per-block vb_encode was the dominant
            # inverter cost (~150 µs/block × postings/128 blocks).
            bounds = np.append(blk_starts, len(g_terms))
            dgaps = np.empty(len(g_docs), dtype=np.int64)
            if len(g_docs):
                dgaps[0] = 1
                dgaps[1:] = g_docs[1:] - g_docs[:-1]
            dgaps[blk_starts] = 1
            docs_bins = vb_encode_sliced(dgaps.astype(np.uint64), bounds)
            tfs_bins = vb_encode_sliced(g_tfs.astype(np.uint64), bounds)
            dls_bins = vb_encode_sliced(g_dls.astype(np.uint64), bounds)
            pos_bins = None
            if store_pos and kind == "text":
                p_all = g_pos.astype(np.int64)
                pgaps = np.diff(p_all, prepend=np.int64(0))
                pgaps[pos_starts] = p_all[pos_starts]
                pos_bounds = np.append(
                    pos_starts[blk_starts],
                    pos_ends[-1] if len(pos_ends) else 0,
                )
                pos_bins = vb_encode_sliced(pgaps.astype(np.uint64), pos_bounds)
            # single-posting blocks (sparse terms after the doc-range
            # split; ~all blocks on hash/URL-heavy vocabularies) take a
            # columnar fast path: every derived stat of a 1-posting
            # block is the posting itself, so the per-block loop below
            # — whose pareto/sub-summary machinery is pure overhead at
            # n=1 — runs only for multi-posting blocks. Measured 9.8 s
            # → ~2 s per 16k-doc segment on a df=1 vocabulary.
            sizes = blk_ends - blk_starts
            single = np.flatnonzero(sizes == 1)
            multi = np.flatnonzero(sizes > 1)
            if len(single):
                bs = blk_starts[single]
                s_doc = g_docs[bs]
                s_tf = g_tfs[bs].tolist()
                s_dl = g_dls[bs].tolist()
                if pos_bins is not None:
                    s_pos = [pos_bins[b] for b in single.tolist()]
                elif store_pos and kind == "keyword":
                    s_pos = [b"\x00"] * len(single)
                else:
                    s_pos = [b""] * len(single)
                sing_frames.append(
                    pd.DataFrame(
                        {
                            "field": fname,
                            "term": g_terms[bs].astype(object),
                            "seg_id": seg_id,
                            "block_id": blk_ids[bs],
                            "doc_base": s_doc,
                            "max_docid": s_doc,
                            "n": 1,
                            "block_max_tf": g_tfs[bs],
                            "block_min_dl": g_dls[bs],
                            "imp_tfs": pd.Series(
                                [[t] for t in s_tf], dtype=object
                            ),
                            "imp_dls": pd.Series(
                                [[d] for d in s_dl], dtype=object
                            ),
                            "sub_min_docs": pd.Series(
                                [[d] for d in s_doc.tolist()], dtype=object
                            ),
                            "sub_max_docs": pd.Series(
                                [[d] for d in s_doc.tolist()], dtype=object
                            ),
                            "sub_imp_tfs": pd.Series(
                                [[[t]] for t in s_tf], dtype=object
                            ),
                            "sub_imp_dls": pd.Series(
                                [[[d]] for d in s_dl], dtype=object
                            ),
                            "cf": g_tfs[bs],
                            "docs_bin": pd.Series(
                                [docs_bins[b] for b in single.tolist()],
                                dtype=object,
                            ),
                            "tfs_bin": pd.Series(
                                [tfs_bins[b] for b in single.tolist()],
                                dtype=object,
                            ),
                            "dls_bin": pd.Series(
                                [dls_bins[b] for b in single.tolist()],
                                dtype=object,
                            ),
                            "pos_bin": pd.Series(s_pos, dtype=object),
                        }
                    )
                )
            cuts_cache: dict[int, np.ndarray] = {}
            for b in multi.tolist():
                s, e = blk_starts[b], blk_ends[b]
                term = g_terms[s]
                d = g_docs[s:e]
                t = g_tfs[s:e]
                dl = g_dls[s:e]
                # sub-range summaries: WAND_SUBS equal posting runs,
                # each with its own doc span and Pareto (tf, dl)
                # frontier (exact per-sub max impact). The block-level
                # frontier is the pareto of the sub-frontier union —
                # identical to pareto(whole block) since dominance
                # within a sub implies dominance in the block
                cuts = cuts_cache.get(e - s)
                if cuts is None:
                    cuts = np.unique(
                        np.linspace(0, e - s, WAND_SUBS + 1).astype(np.int64)
                    )
                    cuts_cache[e - s] = cuts
                sub_min, sub_max, sub_itf, sub_idl = [], [], [], []
                f_tf, f_dl = [], []
                for a, z in zip(cuts[:-1], cuts[1:]):
                    sub_min.append(int(d[a]))
                    sub_max.append(int(d[z - 1]))
                    s_tf, s_dl = pareto_impacts(t[a:z], dl[a:z])
                    sub_itf.append(s_tf.tolist())
                    sub_idl.append(s_dl.tolist())
                    f_tf.append(s_tf)
                    f_dl.append(s_dl)
                if len(f_tf) == 1:
                    imp_tf, imp_dl = f_tf[0], f_dl[0]
                else:
                    imp_tf, imp_dl = pareto_impacts(
                        np.concatenate(f_tf), np.concatenate(f_dl)
                    )
                docs_bin = docs_bins[b]
                tfs_bin = tfs_bins[b]
                dls_bin = dls_bins[b]
                if pos_bins is not None:
                    pos_bin = pos_bins[b]
                elif store_pos and kind == "keyword":
                    pos_bin = b"\x00" * (e - s)  # vb(0) is one 0x00 byte
                else:
                    pos_bin = b""
                out_rows.append(
                    (
                        fname,
                        str(term),
                        seg_id,
                        int(blk_ids[s]),
                        int(d[0]),
                        int(d[-1]),
                        int(e - s),
                        int(t.max()),
                        int(dl.min()),
                        [int(x) for x in imp_tf],
                        [int(x) for x in imp_dl],
                        sub_min,
                        sub_max,
                        sub_itf,
                        sub_idl,
                        int(t.sum()),
                        docs_bin,
                        tfs_bin,
                        dls_bin,
                        pos_bin,
                    )
                )
        cols = [f.name for f in POSTINGS_SCHEMA.fields]
        parts = sing_frames
        if out_rows or not parts:
            parts = parts + [pd.DataFrame(out_rows, columns=cols)]
        if len(parts) == 1:
            return parts[0][cols]
        return pd.concat(parts, ignore_index=True)[cols]

    return invert


_SIMPLE_CLASS_RX = re.compile(r"\[[A-Za-z0-9\-]+\]\+")


def _jvm_token_count(analyzer: Analyzer, col):
    """Codegen'd surviving-token count Column, or None when the analyzer
    is not JVM-expressible. Safe exactly when (a) no transliteration
    (Python NFKD has no Spark-SQL equivalent) and (b) the token pattern
    is a plain ASCII character class — identical semantics in Python re
    and Java regex. Filters (lowercase → stop words → min length) mirror
    Analyzer.tokens' chain as an array filter. ``col=None`` probes
    support only."""
    if analyzer.translit or not _SIMPLE_CLASS_RX.fullmatch(analyzer.token_pattern):
        return None
    if col is None:
        col = F.lit("")
    toks = F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(analyzer.token_pattern), F.lit(0)
    )
    if analyzer.stop_words or analyzer.min_length:
        if analyzer.lowercase:
            toks = F.transform(toks, F.lower)
        sw = sorted(analyzer.stop_words)
        n = analyzer.min_length

        def keep(t):
            c = F.lit(True)
            if sw:
                c = c & ~t.isin(*sw)
            if n:
                c = c & (F.length(t) >= n)
            return c

        toks = F.filter(toks, keep)
    return F.size(toks)


def _docs_with_lengths(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Add len_<f> (surviving-token count) and norm_<f> (quantized byte
    of lengthNorm·docBoost·fieldBoost) per indexed field.

    Fast path (the docs phase was the largest build phase — 13.1 s of
    25.2 s at sf0.1, all of it the Arrow round trip of every column
    through Python): when the analyzer is JVM-expressible
    (:func:`_jvm_token_count`), token counts run inside whole-stage
    codegen and only the (len, boost) NUMERIC pairs cross into Python
    for the norm-byte quantization (the 256-entry smallfloat codebook
    lookup) — no text ever leaves the JVM. Otherwise one mapInPandas
    pass computes both, as before."""
    text_fields = [f for f, k in cfg.field_policy.items() if k == "text"]
    kw_fields = [f for f, k in cfg.field_policy.items() if k == "keyword"]
    analyzer = cfg.analyzer
    field_boosts = cfg.field_boosts
    doc_boost_col = cfg.doc_boost_col

    from lucene_spark.search.similarity import get_default  # lazy: cycle

    ln_fn = get_default().length_norm  # driver-resolved hook

    if _jvm_token_count(analyzer, None) is not None:

        @F.pandas_udf(IntegerType())
        def norm_udf(lens: pd.Series, boost: pd.Series) -> pd.Series:
            ln = lens.to_numpy(np.int64)
            norms = encode_norm_array(
                np.asarray(ln_fn(ln), np.float64) * boost.to_numpy(np.float64)
            )
            return pd.Series(np.where(ln == 0, 0, norms).astype(np.int32))

        def boost_col(f: str):
            b = F.lit(float(field_boosts.get(f, 1.0)))
            if doc_boost_col:
                if doc_boost_col not in df.columns:
                    raise ValueError(
                        f"doc_boost_col {doc_boost_col!r} is not a column "
                        f"of the input (have: {sorted(df.columns)})"
                    )
                b = b * F.coalesce(
                    F.col(doc_boost_col).cast("double"), F.lit(1.0)
                )
            if f"boost_{f}" in df.columns:
                b = b * F.coalesce(F.col(f"boost_{f}").cast("double"), F.lit(1.0))
            return b

        out = df
        for f in text_fields:
            out = out.withColumn(
                f"len_{f}", _jvm_token_count(analyzer, F.col(f)).cast("long")
            )
        for f in kw_fields:
            out = out.withColumn(
                f"len_{f}", F.col(f).isNotNull().cast("long")
            )
        for f in text_fields + kw_fields:
            out = out.withColumn(
                f"norm_{f}", norm_udf(F.col(f"len_{f}"), boost_col(f))
            )
        return out

    new_fields = []
    for f in text_fields + kw_fields:
        new_fields.append(StructField(f"len_{f}", LongType()))
        new_fields.append(StructField(f"norm_{f}", IntegerType()))
    schema = StructType(df.schema.fields + new_fields)

    def add_lens(it):
        for pdf in it:
            yield _emit_len_norm_cols(
                pdf, pdf.copy(), analyzer, text_fields, kw_fields,
                field_boosts, doc_boost_col,
                length_norm_fn=ln_fn,
            )

    return df.mapInPandas(add_lens, schema)


def _resolve_chunk_span(
    index_dir: str,
    cfg: IndexConfig,
    max_doc: int,
    done_chunks: set[int],
    resume: bool,
) -> int:
    """Pick (and persist) the phase-A resume-chunk span in docs.

    The span is PERSISTED (build_plan.json) before any chunk runs and
    reused verbatim on resume: re-deriving it could remap done chunk
    ids to different doc ranges (e.g. after a config or code change)
    and silently skip never-inverted segments. The MAX_BUILD_CHUNKS cap
    applies only to FRESH builds — a partial build whose manifests
    predate build_plan.json ran with the legacy uncapped span, so a
    plan-less resume with done chunks derives that legacy span (and
    persists it for subsequent resumes) instead of re-capping.
    """
    plan_path = os.path.join(index_dir, "build_plan.json")
    if resume and os.path.exists(plan_path):
        with open(plan_path) as fh:
            return int(json.load(fh)["chunk_span"])
    span = cfg.seg_size * cfg.segments_per_commit
    n_chunks = int(max_doc // span) + 1
    if not done_chunks and n_chunks > MAX_BUILD_CHUNKS:
        span *= -(-n_chunks // MAX_BUILD_CHUNKS)  # ceil division
    with open(plan_path + ".tmp", "w") as fh:
        json.dump({"chunk_span": span}, fh)
    os.rename(plan_path + ".tmp", plan_path)
    return span


def build_index(
    spark: SparkSession,
    df: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    order_cols: list[str] | None = None,
    resume: bool = True,
) -> "SparkIndex":
    """End-to-end build: docs → segments (resumable) → merge → publish."""
    import time as _time

    _t0 = _time.time()
    _timings: dict[str, float] = {}

    def _mark(phase: str):
        nonlocal _t0
        _timings[phase] = round(_time.time() - _t0, 3)
        _t0 = _time.time()
        if os.environ.get("LUCENE_SPARK_BUILD_TIMINGS"):
            print(f"[build] {phase}: {_timings[phase]}s", flush=True)

    cfg = cfg or IndexConfig()
    docs_path = os.path.join(index_dir, "docs")
    seg_path = os.path.join(index_dir, "segments")
    manifest_path = os.path.join(index_dir, "manifests")
    postings_path = os.path.join(index_dir, "postings")
    dict_path = os.path.join(index_dir, "term_dict")
    stats_path = os.path.join(index_dir, "stats.json")

    # ---- docs table (doc ids + lengths + norms) ----
    n_docs_known = None  # set when this build assigned the (dense) ids
    if not (resume and os.path.exists(os.path.join(docs_path, "_SUCCESS"))):
        if "doc_id" not in df.columns:
            oc = order_cols or ["conv_id", "turn_idx"]
            if len(oc) == 2:
                # shuffle-free id assignment: conv prefix-sum + broadcast
                # join + dense turn offsets (falls back to a windowed
                # rank if turn_idx has gaps). Avoids sampling/sorting/
                # persisting the full table.
                docs = assign_doc_ids_dense(df, oc[0], oc[1], cfg=cfg)
            else:
                # general path: range exchange + offset-shifted local ids,
                # with the length/norm kernel fused into the same pass
                docs = assign_doc_ids(df, oc, cfg=cfg)
        else:
            docs = _docs_with_lengths(df, cfg)
        docs.write.mode("overwrite").parquet(docs_path)
        n_docs_known = getattr(docs, "_lucene_n_docs", None)
        pinned = getattr(docs, "_lucene_pinned", None)
        if pinned is not None:
            pinned.unpersist()
    # Split sizing: with the default 128 MB maxPartitionBytes a
    # few-GB docs table packs into ~10 splits and the inversion
    # shuffle's map stage runs 10-wide on a 32-core cluster (measured:
    # only ~10 busy Python/JVM workers). Target ~2 splits per core,
    # clamped to [16 MB, 128 MB] so the 100 TB case keeps 128 MB splits.
    total_bytes = sum(
        f.stat().st_size for f in os.scandir(docs_path) if f.name.endswith(".parquet")
    )
    par = spark.sparkContext.defaultParallelism
    split_key = "spark.sql.files.maxPartitionBytes"
    split_prev = spark.conf.get(split_key)
    target = max(16 << 20, min(128 << 20, total_bytes // max(1, par * 2)))
    spark.conf.set(split_key, str(target))
    docs = spark.read.parquet(docs_path)
    _mark("docs")

    # ---- phase A: per-segment inversion, manifest-checkpointed ----
    done: set[int] = set()
    # Resume unit = CHUNK of segments: chunk_id = seg_id //
    # segments_per_commit (static mapping, independent of what is
    # already done). Each chunk writes to its own seg_chunk=<c> subdir
    # with a PLAIN parquet write — dynamic ``partitionBy`` writes were
    # measured 2x slower (per-task sort + hundreds of tiny directories).
    # A chunk's manifest rows are appended only after its data write
    # completes, so "chunk id present in manifests" == durable.
    done_chunks: set[int] = set()
    if resume and os.path.exists(os.path.join(manifest_path, "_SUCCESS")):
        done_chunks = {
            int(r["chunk"])
            for r in spark.read.parquet(manifest_path).select("chunk").distinct().collect()
        }
    # purge orphan chunk dirs (written but never manifested — a build
    # killed between block write and manifest commit) so resume can't
    # duplicate data
    if os.path.isdir(seg_path):
        import shutil

        for entry in os.listdir(seg_path):
            if entry.startswith("seg_chunk="):
                cid = int(entry.split("=", 1)[1])
                if cid not in done_chunks:
                    shutil.rmtree(os.path.join(seg_path, entry))
    with_seg = docs.withColumn(
        "seg_id", (F.col("doc_id") / F.lit(cfg.seg_size)).cast("long")
    )
    # ids this build assigned are dense 0..n-1, so max(doc_id) is known
    # without re-scanning the written table; resumes (or caller-supplied
    # doc_id columns) aggregate it in one column-pruned job
    max_doc = (
        n_docs_known - 1
        if n_docs_known
        else docs.agg(F.max("doc_id")).collect()[0][0]
    )
    # Resume-chunk span scales with input: each chunk is one serial
    # Spark job (~seconds of scheduling), so cap their count — at 10^12
    # turns the configured span alone would mean ~156k serial jobs. The
    # chosen span is PERSISTED (build_plan.json) before any chunk runs
    # and reused verbatim on resume: re-deriving it could remap done
    # chunk ids to different doc ranges (e.g. after a config or code
    # change) and silently skip never-inverted segments.
    span = _resolve_chunk_span(index_dir, cfg, max_doc, done_chunks, resume)
    n_chunks = int(max_doc // span) + 1
    pending = [c for c in range(n_chunks) if c not in done_chunks]
    _mark("seg_plan")
    invert = _invert_segment(cfg)
    # AQE partition coalescing merges the (few, fat) per-segment groups
    # into fewer tasks and serializes the Python inversion kernels —
    # measured 2x slower on local[32]. Pin full parallelism for phase A.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    coalesce_prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")

    # Chunk pipelines run CONCURRENTLY (a small thread pool submitting
    # independent Spark jobs): chunks touch disjoint doc ranges and
    # write to their own seg_chunk=<c> dirs, so the only shared sink is
    # the manifest dir — its appends stay serialized under a lock
    # (concurrent append jobs to one path share the committer's
    # _temporary staging and can corrupt each other). Durability
    # semantics are unchanged: a chunk's manifest commits only after
    # its data write, in the same thread. Serially, each chunk paid
    # scheduling + commit + stage-tail barriers with the cluster idle
    # (~8 s/chunk measured at local[8]); overlapping fills those gaps
    # and matters more as chunk count grows (the 40M smoke runs 10).
    import threading
    from concurrent.futures import ThreadPoolExecutor

    manifest_lock = threading.Lock()

    def run_chunk(c: int) -> None:
        chunk_dir = os.path.join(seg_path, f"seg_chunk={c}")
        part = with_seg.where(
            (F.col("doc_id") >= c * span) & (F.col("doc_id") < (c + 1) * span)
        )
        blocks = part.groupBy("seg_id").applyInPandas(invert, POSTINGS_SCHEMA)
        blocks.write.mode("overwrite").parquet(chunk_dir)
        # manifest rows per segment: lineage + counts (committed per
        # chunk, AFTER its data — "chunk in manifests" == durable)
        m = (
            spark.read.parquet(chunk_dir)
            .groupBy("seg_id")
            .agg(
                F.sum("n").alias("n_postings"),
                F.sum("cf").alias("n_tokens"),
                F.min("doc_base").alias("min_doc_id"),
                F.max("max_docid").alias("max_doc_id"),
                F.count("*").alias("n_blocks"),
            )
            .withColumn("chunk", F.lit(c).cast("long"))
            .withColumn("lineage", F.lit(f"docs_parquet:{docs_path}"))
        )
        with manifest_lock:
            m.write.mode("append").parquet(manifest_path)

    n_workers = min(
        int(os.environ.get("LUCENE_SPARK_CHUNK_CONCURRENCY", "3")),
        max(len(pending), 1),
    )
    try:
        if n_workers > 1 and len(pending) > 1:
            with ThreadPoolExecutor(max_workers=n_workers) as ex:
                # list() re-raises the first failure (chunks already
                # manifested stay durable; orphan dirs purge on resume)
                list(ex.map(run_chunk, pending))
        else:
            for c in pending:
                run_chunk(c)
    finally:
        # a chunk failure must not leave AQE coalescing disabled for
        # the rest of the session
        spark.conf.set(coalesce_key, coalesce_prev)
    _mark("segments")

    # ---- phase B: global merge (pure sort — see module docstring) ----
    seg_blocks = spark.read.parquet(seg_path).drop("seg_chunk")
    n_merge = cfg.merge_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    merged = seg_blocks.repartitionByRange(
        n_merge, "field", "term", "doc_base"
    ).sortWithinPartitions("field", "term", "doc_base")
    merged.write.mode("overwrite").parquet(postings_path)
    _mark("merge")

    # ---- term dictionary (tiny rows: S per term, not posting-sized) ----
    td = (
        seg_blocks.groupBy("field", "term")
        .agg(
            F.sum("n").alias("df"),
            F.sum("cf").alias("cf"),
            F.count("*").alias("n_blocks"),
            F.max("block_max_tf").alias("max_tf"),
        )
        .repartitionByRange(max(1, n_merge // 4), "field", "term")
        .sortWithinPartitions("field", "term")
    )
    td = td.persist()
    td.write.mode("overwrite").parquet(dict_path)
    # two-level dictionary (≙ the reference's .tii/.tis pair,
    # AbstractSegmentWriter.php:404-496): 128-term front-coded blocks
    # keyed by first_term — dictionary range scans read ~128x fewer
    # rows than the flat term_dict (see SparkIndex.terms_from).
    # Fed from the persisted td (not a re-read of dict_path): the flat
    # write, the fc grouping, and its range sampling share one
    # materialization — this phase is small-data and almost pure
    # scheduling overhead, so the saved jobs are the saved time.
    from lucene_spark.codec.frontcode import write_dict_blocks

    # assume_sorted: td's declared plan IS repartitionByRange + sort on
    # (field, term) (above), so the fc pass packs straight off those
    # partitions — no second shuffle of every term string.
    write_dict_blocks(
        td, os.path.join(index_dir, "term_dict_fc"), assume_sorted=True
    )
    td.unpersist()
    _mark("term_dict")

    # ---- stats ----
    text_like = [
        f for f, k in cfg.field_policy.items() if k in ("text", "keyword")
    ]
    aggs = []
    for f in text_like:
        aggs.append(F.sum(F.col(f"len_{f}")).alias(f"sum_len_{f}"))
        aggs.append(
            F.sum((F.col(f"len_{f}") > 0).cast("long")).alias(f"cnt_{f}")
        )
    row = docs.agg(F.count("*").alias("n_docs"), *aggs).collect()[0]
    stats = {
        "n_docs": row["n_docs"],
        "fields": {
            f: {
                "kind": cfg.field_policy[f],
                "sum_len": int(row[f"sum_len_{f}"] or 0),
                "n_docs_with_field": int(row[f"cnt_{f}"] or 0),
            }
            for f in text_like
        },
        "block_size": BLOCK_SIZE,
        # index-time boosts must survive optimize/rebuild — norms are
        # recomputed there from config, and dropping these would
        # silently change every boosted norm byte
        "field_boosts": cfg.field_boosts,
        "doc_boost_col": cfg.doc_boost_col,
        "analyzer": {
            "token_pattern": cfg.analyzer.token_pattern,
            "lowercase": cfg.analyzer.lowercase,
            "stop_words": sorted(cfg.analyzer.stop_words),
            "min_length": cfg.analyzer.min_length,
            "translit": cfg.analyzer.translit,
        },
    }
    stats["build_timings_sec"] = _timings
    with open(stats_path, "w") as fh:
        json.dump(stats, fh)
    _mark("stats")

    spark.conf.set(split_key, split_prev)
    return load_index(spark, index_dir)


def load_index(spark: SparkSession, index_dir: str) -> "SparkIndex":
    return SparkIndex(spark, index_dir)


class SparkIndex:
    """Opened index: tables + IndexReader protocol for query compile."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        if os.path.exists(os.path.join(index_dir, "_merge_commit.json")):
            # a delta merge committed but crashed mid-swap — finish it
            from lucene_spark.streaming.incremental import _finish_merge_swap

            _finish_merge_swap(index_dir)
        self.docs = spark.read.parquet(os.path.join(index_dir, "docs"))
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.term_dict = spark.read.parquet(os.path.join(index_dir, "term_dict"))
        fc_path = os.path.join(index_dir, "term_dict_fc")
        # front-coded dictionary blocks (B6/.tii): used by terms_from
        # when present; disabled while unmerged delta chunks are
        # attached (their terms aren't packed until merge_delta)
        self._fc_blocks = (
            spark.read.parquet(fc_path)
            if os.path.exists(os.path.join(fc_path, "_SUCCESS"))
            else None
        )
        with open(os.path.join(index_dir, "stats.json")) as fh:
            self.stats = json.load(fh)
        self._delta_docs = 0
        self._delta_field_stats: dict[str, dict[str, int]] = {}
        self._attach_delta()
        self.tombstones = None
        self.refresh_tombstones()
        a = self.stats["analyzer"]
        self._analyzer = Analyzer(
            a["token_pattern"],
            lowercase=a["lowercase"],
            stop_words=frozenset(a["stop_words"]),
            min_length=a["min_length"],
            translit=a["translit"],
        )
        self._default_field: str | None = None
        self._df_cache: dict[tuple[str, str], int] = {}

    def _attach_delta(self) -> None:
        """Union unmerged streaming tiers into the queryable views (an
        unmerged reference index is likewise searchable across its whole
        segment list): sealed GENERATIONS (promote_delta output —
        compacted, sorted mini-indexes) plus live delta micro-batches
        not yet promoted into any generation. Term stats aggregate
        across every tier."""
        spark = self.spark
        promoted: set[int] = set()
        tiers = []  # (postings, docs, term_dict) DataFrames to union
        gen_root = os.path.join(self.index_dir, "gens")
        if os.path.isdir(gen_root):
            for entry in sorted(os.listdir(gen_root)):
                gdir = os.path.join(gen_root, entry)
                gmeta = os.path.join(gdir, "meta")
                if not os.path.exists(os.path.join(gmeta, "_SUCCESS")):
                    continue  # partial generation (crashed promote) — ignored
                tiers.append(
                    tuple(
                        spark.read.parquet(os.path.join(gdir, sub))
                        for sub in ("postings", "docs", "term_dict")
                    )
                )
                for m in spark.read.parquet(gmeta).collect():
                    promoted.update(json.loads(m["batch_ids"]))
                    self._delta_docs += m["n_docs"]
                    for f, fs in json.loads(m["field_stats"]).items():
                        agg = self._delta_field_stats.setdefault(
                            f, {"sum_len": 0, "n_docs_with_field": 0}
                        )
                        agg["sum_len"] += fs["sum_len"]
                        agg["n_docs_with_field"] += fs["n_docs_with_field"]

        droot = os.path.join(self.index_dir, "delta")
        meta_dir = os.path.join(droot, "meta")
        live_batches: list[int] = []
        if os.path.isdir(meta_dir):
            for m in spark.read.parquet(meta_dir).collect():
                bid = int(m["batch_id"])
                if bid in promoted:
                    continue  # already sealed into a generation
                live_batches.append(bid)
                self._delta_docs += m["n_docs"]
                for f, fs in json.loads(m["field_stats"]).items():
                    agg = self._delta_field_stats.setdefault(
                        f, {"sum_len": 0, "n_docs_with_field": 0}
                    )
                    agg["sum_len"] += fs["sum_len"]
                    agg["n_docs_with_field"] += fs["n_docs_with_field"]
            if live_batches:
                flt = F.col("batch").isin([int(b) for b in live_batches])
                tiers.append(
                    (
                        spark.read.parquet(os.path.join(droot, "postings")).where(flt),
                        spark.read.parquet(os.path.join(droot, "docs")).where(flt),
                        spark.read.parquet(os.path.join(droot, "term_dict")).where(flt),
                    )
                )

        if not tiers:
            return
        self._fc_blocks = None  # tier terms aren't front-coded yet
        for d_post, d_docs, d_td in tiers:
            self.postings = self.postings.unionByName(
                d_post.select(self.postings.columns)
            )
            self.docs = self.docs.unionByName(d_docs.select(self.docs.columns))
            self.term_dict = self.term_dict.unionByName(
                d_td.select(self.term_dict.columns)
            )
        self.term_dict = self.term_dict.groupBy("field", "term").agg(
            F.sum("df").alias("df"),
            F.sum("cf").alias("cf"),
            F.sum("n_blocks").alias("n_blocks"),
            F.max("max_tf").alias("max_tf"),
        )

    def refresh_tombstones(self) -> None:
        """(Re)load the logical-delete tombstone table if present."""
        from lucene_spark.index.lifecycle import load_tombstones

        self.tombstones = load_tombstones(self.spark, self.index_dir)

    # ---------------------------------------------- IndexReader protocol
    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"] + self._delta_docs

    def num_docs(self) -> int:
        """≙ reference numDocs() (SearchIndexInterface.php:87): live doc
        count, i.e. :attr:`n_docs` (= count()/maxDoc(), which keeps
        counting deleted docs until optimize) minus logical deletes."""
        from lucene_spark.index.lifecycle import deleted_count

        return self.n_docs - deleted_count(self)

    def is_deleted(self, doc_id: int) -> bool:
        """≙ reference isDeleted($id) (SearchIndexInterface.php:97)."""
        if self.tombstones is None:
            return False
        return self.tombstones.where(F.col("doc_id") == int(doc_id)).limit(1).count() > 0

    def has_deletions(self) -> bool:
        """≙ reference hasDeletions() (SearchIndexInterface.php:295)."""
        return self.tombstones is not None

    def field_names(self, indexed_only: bool = True) -> list[str]:
        # field_policy insertion order ≙ the reference's .fnm order
        return list(self.stats["fields"].keys())

    def set_default_search_field(self, f: str | None):
        self._default_field = f

    def default_search_field(self):
        return self._default_field

    def analyzer(self):
        return self._analyzer

    def prefetch_terms(self, terms) -> None:
        """Batch-load df/cf for (field, text) pairs into the driver cache
        with ONE filtered scan of term_dict (predicate pushdown on the
        sorted term column → row-group pruning)."""
        todo = [(t.field, t.text) for t in terms if (t.field, t.text) not in self._df_cache]
        if not todo:
            return
        # per-field In filters (flat nodes) — a per-term OR chain
        # overflows the JVM stack past ~300 terms (1024-term fuzzy)
        by_field: dict = {}
        for f, x in todo:
            by_field.setdefault(f, set()).add(x)
        cond = None
        for f, texts in by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(sorted(texts))
            cond = c if cond is None else (cond | c)
        rows = self.term_dict.where(cond).select("field", "term", "df").collect()
        found = {(r["field"], r["term"]): r["df"] for r in rows}
        for key in todo:
            self._df_cache[key] = found.get(key, 0)

    def has_term(self, term) -> bool:
        return self.doc_freq(term) > 0

    def doc_freq(self, term) -> int:
        key = (term.field, term.text)
        if key not in self._df_cache:
            self.prefetch_terms([term])
        return self._df_cache[key]

    def terms_from(self, field: str, start: str = "", page_size: int = 8192):
        """Sorted term iterator for dictionary expansion (wildcard/fuzzy/
        range). Paginates a pushed-down range scan with a last-key
        cursor so callers see the WHOLE term range — the reference scans
        the full dictionary and caps only the MATCH count
        (Wildcard.php:137, Fuzzy.php:210, Range.php:177); a fixed
        single-call limit silently dropped matches past the window on
        vocabularies over ~1k terms.

        When the index carries front-coded dictionary blocks
        (term_dict_fc — the ``.tii``/``.tis`` two-level layout,
        DictionaryLoader.php:34-243), pages are fetched as packed
        128-term blocks keyed by first_term: ~128x fewer scan rows per
        page, decoded driver-side. Falls back to the flat term_dict scan
        (parquet row-group pruning on the sorted term column) when
        blocks are absent or a streaming delta is attached. Both paths
        are lazy — callers that break early (prefix exhausted, >1024
        matches raised) never pay for later pages."""
        if self._fc_blocks is not None:
            yield from self._terms_from_fc(field, start, page_size)
            return
        cursor = start
        inclusive = True
        while True:
            cond = (F.col("field") == field) & (
                (F.col("term") >= cursor) if inclusive else (F.col("term") > cursor)
            )
            rows = (
                self.term_dict.where(cond)
                .orderBy("term")
                .select("term")
                .limit(page_size)
                .collect()
            )
            for r in rows:
                yield r["term"]
            if len(rows) < page_size:
                return
            cursor = rows[-1]["term"]
            inclusive = False

    def _terms_from_fc(self, field: str, start: str, page_size: int):
        """Dictionary range scan over front-coded blocks: first locate
        the block COVERING ``start`` (greatest first_term <= start — one
        TakeOrdered of a single row), then page forward by first_term
        cursor, decoding each packed block on the driver."""
        from lucene_spark.codec.frontcode import TERMS_PER_BLOCK, decode_term_block

        fc = self._fc_blocks
        fcond = F.col("field") == field
        blocks_per_page = max(1, page_size // TERMS_PER_BLOCK)
        pre = (
            fc.where(fcond & (F.col("first_term") <= start))
            .orderBy(F.col("first_term").desc())
            .select("first_term")
            .limit(1)
            .collect()
        )
        cursor = pre[0]["first_term"] if pre else None
        inclusive = True
        while True:
            cond = fcond
            if cursor is not None:
                cond = cond & (
                    (F.col("first_term") >= cursor)
                    if inclusive
                    else (F.col("first_term") > cursor)
                )
            rows = (
                fc.where(cond)
                .orderBy("first_term")
                .select("first_term", "terms_bin")
                .limit(blocks_per_page)
                .collect()
            )
            for r in rows:
                for t in decode_term_block(bytes(r["terms_bin"])):
                    if t >= start:
                        yield t
            if len(rows) < blocks_per_page:
                return
            cursor = rows[-1]["first_term"]
            inclusive = False

    # ---- distributed dictionary expansion (index/expansion.py) ----
    # The predicate runs INSIDE the term_dict scan (JVM rlike /
    # levenshtein over the pushed-down prefix slice), so wildcard/
    # fuzzy/range rewrites collect only matching terms — bounded by the
    # 1024-term query limit, never the vocabulary size. terms_from
    # remains the generic sorted iterator (reference parity fallback,
    # used by readers without a term_dict DataFrame).

    def match_terms_regex(
        self, field, prefix, java_regex, limit, is_match=None
    ) -> list[str]:
        from lucene_spark.index.expansion import match_terms_regex

        return match_terms_regex(
            self.term_dict, field, prefix, java_regex, limit, is_match
        )

    def match_terms_fuzzy(
        self, field, prefix, rest, min_similarity, limit, is_match=None
    ) -> list[str]:
        from lucene_spark.index.expansion import match_terms_fuzzy

        return match_terms_fuzzy(
            self.term_dict, field, prefix, rest, min_similarity, limit, is_match
        )

    def match_terms_range(
        self, field, lower, upper, inclusive, limit
    ) -> list[str]:
        from lucene_spark.index.expansion import match_terms_range

        return match_terms_range(
            self.term_dict, field, lower, upper, inclusive, limit
        )

    def avg_field_len(self, field: str) -> float:
        fs = self.stats["fields"][field]
        d = self._delta_field_stats.get(field, {})
        n = fs["n_docs_with_field"] + d.get("n_docs_with_field", 0)
        s = fs["sum_len"] + d.get("sum_len", 0)
        return s / n if n else 0.0
