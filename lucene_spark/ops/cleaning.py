"""Corpus-cleaning operators: PII detection/redaction, Gopher-style
repetition statistics, and corpus-level boilerplate-line removal.

The pre-training-pipeline layer on the same pure-Catalyst discipline
as ops/textstats.py:

- Per-document ops (``pii_stats``, ``pii_redact``, ``repetition_stats``,
  ``gopher_repetition_filter``) are single projections — JVM regexp +
  higher-order array functions, no Python, no shuffle. At 100 TB they
  cost exactly one scan and pipeline with whatever filter follows.
- The corpus-level op (``boilerplate_lines`` / ``remove_boilerplate``)
  is one line-level groupBy (the unavoidable shuffle — counting how
  many documents share a line IS a global aggregation) followed by an
  anti-join on the 8-byte line hash: the dictionary side carries no
  line text, and whether it broadcasts is left to Catalyst/AQE — its
  size depends on the corpus's duplication statistics and the
  ``min_docs`` threshold (see ``remove_boilerplate``). The
  per-document regroup remains, an id-keyed shuffle of the same
  volume as the input.

Reference anchor: the reference engine (sajya/lucene) has no cleaning
surface — these are the LLM-data-pipeline ops the brief adds, modeled
on the published Gopher repetition filters (Rae et al. 2021, table A1)
and C4/RefinedWeb-style line-level boilerplate removal.

All patterns avoid lookarounds and backreferences so the same regex
text runs identically under Java regex (Spark) and RE2 (DuckDB),
keeping an exact SQL oracle possible for every op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.ops.dedup import md5_long, tokens, word_shingles

def _text(text_col: str) -> Column:
    """NULL text is treated as the empty document everywhere (real
    corpora have NULL rows; without this, split/regexp propagate NULL
    through every stat and a NULL doc silently poisons aggregates)."""
    return F.coalesce(F.col(text_col), F.lit(""))


# ---------------------------------------------------------------- PII

# Detection patterns, applied longest-structure-first so redaction of
# one class never chews a hole in another (email before ip: a redacted
# email can no longer donate digits to an ip/phone match).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("credit_card", r"\b(?:\d{4}[- ]){3}\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
]
PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "credit_card": "<CREDIT_CARD>",
    "ssn": "<SSN>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
}


def pii_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_credit_card, n_ssn, n_ipv4, n_phone, has_pii).

    Counts are per-class raw regexp matches on the ORIGINAL text (no
    sequential masking), so ``n_ipv4 + n_phone`` can both count digits
    an email would have consumed during redaction; ``pii_redact`` is
    the authoritative masking order. One projection, no shuffle.
    """
    t = _text(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)) for name, pat in PII_PATTERNS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col).alias("id"),
        *[counts[name].alias(f"n_{name}") for name, _ in PII_PATTERNS],
        (total > 0).alias("has_pii"),
    )


def pii_redact(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """Replace every PII match with its class token (``<EMAIL>`` …),
    applied in PII_PATTERNS order (longest structure first). Pure
    chained ``regexp_replace`` — one projection, no shuffle; at 100 TB
    this pipelines into the scan that reads the text column.
    """
    out = out_col or text_col
    c: Column = _text(text_col)
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, PII_TOKENS[name])
    return df.withColumn(out, c)


# ------------------------------------------- Gopher repetition stats

BULLET_LINE = r"^[-*•‣▪●·]"
# ellipsis endings are matched with endswith, NOT a '$'-anchored regex:
# Java's non-MULTILINE '$' also matches before a trailing U+2028/U+2029/
# U+0085 (which survive the ASCII line trim) while RE2's and Python's
# do not — endswith has identical semantics in all three engines
ELLIPSIS_SUFFIXES = ("...", "…")


# ASCII whitespace trimmed from line ends (space, tab, CR, VT, FF —
# NL can't survive the split). An explicit charset so the DuckDB twin
# (trim(x, <same chars>)) is character-identical; plain trim() strips
# spaces only in BOTH engines and would keep tab-only lines "non-empty".
LINE_TRIM_CHARS = " \t\r\x0b\x0c"


def _nonempty_lines(text_col: str) -> Column:
    return F.filter(
        F.transform(
            F.split(_text(text_col), "\n"),
            lambda l: F.btrim(l, F.lit(LINE_TRIM_CHARS)),
        ),
        lambda l: F.length(l) > 0,
    )


def _let(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``body`` as a lambda-bound
    variable — a let-binding built from a one-element ``transform``.

    Catalyst has no common-subexpression elimination for higher-order
    functions (they run as codegen fallbacks), so an expression
    referenced k times is EVALUATED k times; binding it to a lambda
    variable makes every reference a cheap variable read. Used below to
    share the sorted line array and the n-gram top-run folds across the
    stat columns.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def _dup_occurrence_chars(sorted_arr: Column, n: Column) -> Column:
    """Σ length over occurrences that belong to a duplicate group.

    On the SORTED array an element is part of a duplicate group iff it
    equals its left or right neighbour — so one pass over indices, no
    per-group map building (Catalyst has no map-accumulating aggregate
    that stays columnar).
    """
    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            (
                (i > 1)
                & (F.element_at(sorted_arr, i) == F.element_at(sorted_arr, i - 1))
            )
            | (
                (i < n)
                & (F.element_at(sorted_arr, i) == F.element_at(sorted_arr, i + 1))
            ),
            F.length(F.element_at(sorted_arr, i)).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _top_run(sorted_arr: Column) -> Column:
    """struct(best_n, best_val): the most frequent element of a SORTED
    array and its count — max run length, one fold, ties break to the
    first (smallest) value because a later equal run does not displace
    the incumbent.
    """
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_n"),
        F.lit("").alias("best_val"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best_n"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best_n"]).alias("best_n"),
            F.when(better, x).otherwise(acc["best_val"]).alias("best_val"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(
            acc["best_n"].alias("best_n"), acc["best_val"].alias("best_val")
        ),
    )


def _gram_char_frac(toks: Column, tok_chars: Column, n: int) -> Column:
    """Fraction of token characters covered by the most frequent word
    n-gram: best_count × chars-in-gram / total token chars (the Gopher
    'fraction of characters in the most frequent n-gram' measure; the
    n−1 joining spaces are not counted as gram characters).
    """

    def frac_of(top: Column) -> Column:
        gram_chars = F.length(top["best_val"]) - F.lit(n - 1)
        frac = (top["best_n"] * gram_chars).cast("double") / tok_chars
        # count×len over-counts characters shared by OVERLAPPING
        # occurrences ('spam spam spam' → 2×8 chars from 12), so cap
        # at 1: the measure is a fraction of the document's characters
        return F.when(
            (tok_chars > 0) & (top["best_n"] > 0), F.least(frac, F.lit(1.0))
        ).otherwise(F.lit(0.0))

    # let-bind the fold: best_n/best_val are referenced three times
    return _let(_top_run(F.sort_array(word_shingles(toks, n))), frac_of)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style per-document repetition measures (Rae et al. 2021):

    (id, n_lines, dup_line_frac, dup_line_char_frac, top2gram_char_frac,
    top3gram_char_frac, bullet_line_frac, ellipsis_line_frac)

    - dup_line_frac: duplicate line OCCURRENCES / lines (a line seen
      k>1 times contributes k−1).
    - dup_line_char_frac: characters inside lines whose text occurs
      more than once / total line characters (all occurrences count,
      per the Gopher definition).
    - topNgram_char_frac: see ``_gram_char_frac``.
    - bullet/ellipsis_line_frac: lines starting with a bullet glyph /
      ending in an ellipsis.

    Lines are trimmed and empty lines dropped before any measure.

    Plan shape: all eight measures are computed inside ONE struct
    expression per row, let-bound (``_let``) so each fold runs once,
    and emitted through ``explode(array(struct))`` — the Generate node
    is a deliberate optimizer barrier: without it, a downstream filter
    on the stat columns (``gopher_repetition_filter``) gets pushed
    into the projection and re-derives the whole tokenize/sort/fold
    tree once PER REFERENCED COLUMN (measured 9× slower at 200k docs,
    since higher-order functions get no codegen or common-subexpression
    elimination). Still one scan, no shuffle, no Python.
    """

    def stats_of(b: Column) -> Column:
        lines, toks = b["lines"], b["toks"]
        nl = F.size(lines)
        n_dup_occ = nl - F.size(F.array_distinct(lines))
        line_chars = F.aggregate(
            lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l)
        )
        dup_chars = _let(
            F.sort_array(lines), lambda sl: _dup_occurrence_chars(sl, nl)
        )
        tok_chars = F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        )

        def line_frac(pred) -> Column:
            hits = F.size(F.filter(lines, pred))
            return F.when(nl > 0, hits.cast("double") / nl).otherwise(
                F.lit(0.0)
            )

        def is_ellipsis(l: Column) -> Column:
            cond = None
            for suf in ELLIPSIS_SUFFIXES:
                c = l.endswith(F.lit(suf))
                cond = c if cond is None else cond | c
            return cond

        return F.struct(
            nl.alias("n_lines"),
            F.round(
                F.when(nl > 0, n_dup_occ.cast("double") / nl).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.when(line_chars > 0, dup_chars.cast("double") / line_chars)
                .otherwise(F.lit(0.0)),
                6,
            ).alias("dup_line_char_frac"),
            F.round(_gram_char_frac(toks, tok_chars, 2), 6).alias(
                "top2gram_char_frac"
            ),
            F.round(_gram_char_frac(toks, tok_chars, 3), 6).alias(
                "top3gram_char_frac"
            ),
            F.round(
                line_frac(lambda l: l.rlike(BULLET_LINE)), 6
            ).alias("bullet_line_frac"),
            F.round(line_frac(is_ellipsis), 6).alias("ellipsis_line_frac"),
        )

    base = F.struct(
        _nonempty_lines(text_col).alias("lines"),
        tokens(_text(text_col)).alias("toks"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(_let(base, stats_of))).alias("_rs"),
    ).select("id", "_rs.*")


# Published Gopher thresholds (Rae et al. 2021, table A1) for the
# measures computed above; documents at or below every threshold keep.
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top2gram_char_frac": 0.20,
    "top3gram_char_frac": 0.18,
    "bullet_line_frac": 0.90,
    "ellipsis_line_frac": 0.30,
}


def gopher_repetition_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """repetition_stats + a ``keep`` flag: true iff every measure is at
    or below its threshold (defaults: the published Gopher values).
    Callers filter on ``keep``; keeping the flag (rather than dropping
    rows here) lets one scan feed both the filtered corpus and the
    rejection audit.
    """
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    stats = repetition_stats(df, id_col, text_col)
    keep = None
    for name, bound in sorted(th.items()):
        cond = F.col(name) <= F.lit(bound)
        keep = cond if keep is None else keep & cond
    return stats.withColumn("keep", keep)


# ------------------------------------------------- boilerplate lines


def boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 2
) -> DataFrame:
    """(line, line_hash, n_docs): trimmed non-empty lines occurring in
    ≥ min_docs DISTINCT documents — the C4/RefinedWeb boilerplate
    dictionary (nav bars, cookie banners, signatures).

    One explode + one groupBy(line_hash) — the single unavoidable
    shuffle (document frequency of a line is a global count), keyed on
    the 8-byte hash so downstream lookups never carry line text. The
    per-document ``array_distinct`` BEFORE the explode is the map-side
    guard: a pathological document repeating one line a million times
    contributes one row, so no hot line key sees more rows than there
    are documents, and ``count(*)`` (cheap) equals count(distinct doc)
    (expensive) by construction. A 60-bit hash collision would merge
    two lines' doc counts — with p < pairs/2^60, not a design concern.
    """
    lines = df.select(
        F.explode(F.array_distinct(_nonempty_lines(text_col))).alias("line")
    )
    return (
        lines.select("line", md5_long(F.col("line")).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.first("line").alias("line"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line", "line_hash", "n_docs")
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    boilerplate: DataFrame | None = None,
    broadcast_dict: bool = False,
) -> DataFrame:
    """(id, text): each document with its boilerplate lines removed.

    A line is boilerplate when its TRIMMED text is in the dictionary;
    surviving lines keep their ORIGINAL bytes — indentation, blank
    lines and trailing whitespace are preserved, so a document with no
    boilerplate comes back byte-identical (split + join on ``\\n`` is
    lossless).

    Plan shape at 100 TB: posexplode the raw lines → LEFT ANTI join on
    the 8-byte line hash (the dictionary side ships hashes only, no
    line text) → one id-keyed groupBy to reassemble. The join strategy
    is deliberately left to Catalyst/AQE: at the default ``min_docs=2``
    on web text the dictionary is NOT guaranteed small (every
    twice-seen line enters it), and force-broadcasting would bet the
    driver's memory on the corpus's duplication statistics — AQE
    broadcasts at runtime exactly when the built side measures small.
    Pass ``broadcast_dict=True`` only when the caller knows the
    dictionary is bounded (high ``min_docs``, curated dictionary).

    Pass ``boilerplate=`` to reuse a precomputed dictionary (e.g. built
    on a sample, or shared across shards).
    """
    bp = (
        boilerplate
        if boilerplate is not None
        else boilerplate_lines(df, id_col, text_col, min_docs=min_docs)
    )
    dict_keys = bp.select("line_hash")
    if broadcast_dict:
        dict_keys = F.broadcast(dict_keys)
    raw = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(_text(text_col), "\n", -1)).alias("pos", "line"),
    )
    keyed = raw.withColumn(
        "line_hash", md5_long(F.btrim(F.col("line"), F.lit(LINE_TRIM_CHARS)))
    )
    kept = keyed.join(dict_keys, on="line_hash", how="left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text")
    )
    # documents whose EVERY line was boilerplate must survive with
    # empty text, not vanish
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(rebuilt, on="id", how="left").select(
        "id", F.coalesce("text", F.lit("")).alias("text")
    )
