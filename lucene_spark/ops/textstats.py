"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst expressions (regexp + higher-order array functions)
— one projection per op, no shuffle, no Python. Each op has an exact
DuckDB-SQL twin used by the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.ops.dedup import md5_long, tokens

# Small fixed English function-word list for the n-gram/stopword
# language heuristic (shared verbatim with the SQL oracle).
LANG_EN_MARKERS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "to", "with",
)

# Multilingual function-word profiles (round 4): the same marker-ratio
# heuristic generalized to the 10 most common web languages. ASCII-only
# marker words on purpose — the shared TOKEN_PATTERN is [a-z0-9]+, so
# an accented marker could never match; every language here has ample
# ASCII function words. Keys sorted ascending: the argmax tie-break is
# (ratio DESC, lang ASC) in BOTH the Spark expression and the SQL
# oracle. Stdlib-honest: a statistical classifier (fastText & co.)
# would slot into the same shape (per-language score columns → argmax).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den",
           "nicht", "ein", "eine", "zu", "auf", "im", "sich"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "it",
           "with", "as", "was", "on", "are", "this"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "las",
           "por", "con", "una", "para", "es", "su"),
    "fr": ("le", "les", "de", "des", "et", "en", "un", "une", "du",
           "que", "pour", "dans", "est", "qui", "au"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
           "ini", "dari", "dalam", "akan", "pada", "juga", "saya", "ke"),
    "it": ("il", "di", "che", "e", "un", "una", "per", "con", "del",
           "le", "si", "non", "sono", "nel", "alla"),
    "nl": ("de", "het", "een", "en", "van", "ik", "te", "dat", "die",
           "in", "je", "niet", "zijn", "op", "aan"),
    "pt": ("o", "a", "de", "que", "e", "do", "da", "em", "um", "uma",
           "para", "com", "os", "no", "se"),
    "sv": ("och", "att", "det", "som", "en", "av", "den", "till",
           "har", "de", "inte", "om", "han", "men", "var"),
    "tr": ("bir", "ve", "bu", "da", "de", "icin", "ile", "olarak",
           "cok", "daha", "gibi", "kadar", "sonra", "ama", "ne"),
}
LANG_MIN_RATIO = 0.05  # below it the text is 'und' (shared with SQL)

# "BPE-ish" piece pattern: letter runs, single digits, or single
# non-alphanumeric glyphs — a cheap proxy for subword token counts.
BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"

FP_BASE = 31
FP_MOD = 2147483647  # 2^31 - 1


def _stop_ratio(toks: Column) -> Column:
    in_set = F.size(
        F.filter(toks, lambda t: t.isin([F.lit(m) for m in LANG_EN_MARKERS]))
    )
    return F.when(F.size(toks) > 0, in_set / F.size(toks)).otherwise(F.lit(0.0))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, stop_ratio, lang) — function-word-ratio language heuristic.

    lang = 'en' when >= 5% of tokens are English function words, else
    'und'. A real n-gram model slots into the same shape (per-language
    marker lists → ratio columns → argmax).
    """
    toks = tokens(text_col)
    ratio = _stop_ratio(toks)
    return df.select(
        F.col(id_col).alias("id"),
        F.round(ratio, 6).alias("stop_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang"),
    )


def lang_id_multi(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, best_ratio, lang) — 10-language function-word argmax.

    Per language: ratio = |tokens ∩ markers| / |tokens| (LANG_MARKERS).
    lang = argmax ratio when the max is >= LANG_MIN_RATIO, else 'und';
    ties break to the alphabetically-first language code — the SQL
    oracle evaluates its CASE arms in the same order. Pure Catalyst
    higher-order-function expressions: one projection, no shuffle,
    no Python."""
    toks = tokens(text_col)
    df2 = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    n = F.size("toks")
    def _in_markers(ms):
        # single-arg lambda builder: a two-parameter lambda would make
        # F.filter pass (element, INDEX) and bind the index column
        return lambda t: t.isin(ms)

    entries = []
    for lang in sorted(LANG_MARKERS):
        markers = [F.lit(m) for m in LANG_MARKERS[lang]]
        hits = F.size(F.filter(F.col("toks"), _in_markers(markers)))
        ratio = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
        # sort key (-ratio, lang): ascending struct sort = ratio DESC,
        # lang ASC — the deterministic argmax shared with the oracle
        entries.append(
            F.struct((-ratio).alias("neg"), F.lit(lang).alias("lang"))
        )
    best = F.sort_array(F.array(*entries))[0]
    best_ratio = -best["neg"]
    return df2.select(
        "id",
        F.round(best_ratio, 6).alias("best_ratio"),
        F.when(best_ratio >= LANG_MIN_RATIO, best["lang"])
        .otherwise(F.lit("und"))
        .alias("lang"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, uniq_ratio, mean_tok_len, stop_ratio, quality).

    quality ∈ [0,1]: blends length band (30..500 tokens), lexical
    diversity, mean token length band (3..12 chars) and stopword
    presence — the standard cheap pre-filter before model-based scoring.
    """
    t = tokens(text_col)
    df2 = df.select(F.col(id_col).alias("id"), t.alias("toks"))
    n = F.size("toks")
    uniq = F.size(F.array_distinct("toks"))
    tok_chars = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_len = F.when(n > 0, tok_chars.cast("double") / n).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n > 0, uniq.cast("double") / n).otherwise(F.lit(0.0))
    stop_r = _stop_ratio(F.col("toks"))
    len_band = F.when((n >= 30) & (n <= 500), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    tok_band = F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    stop_band = F.when(stop_r >= 0.02, F.lit(1.0)).otherwise(F.lit(0.5))
    quality = (
        F.lit(0.3) * len_band
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.2) * tok_band
        + F.lit(0.2) * stop_band
    )
    return df2.select(
        "id",
        n.alias("n_tokens"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        F.round(stop_r, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws, n_words, n_bpe, n_chars) — whitespace tokens, word
    tokens, BPE-ish piece count, character count."""
    lower = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), " +")).alias("n_ws"),
        F.size(tokens(text_col)).alias("n_words"),
        F.size(F.regexp_extract_all(lower, F.lit(BPE_PATTERN), 0)).alias("n_bpe"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp) — order-sensitive rolling polynomial hash of the token
    stream: fold h ← (h·31 + md5_60(tok) mod 2^31) mod (2^31−1).

    Sequential fold (F.aggregate ≙ DuckDB list_reduce) so the oracle is
    bit-exact; detects reorderings that set-based fingerprints miss.
    """
    t = tokens(text_col)
    fp = F.aggregate(
        t,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + md5_long(x) % 2**31) % FP_MOD,
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))
