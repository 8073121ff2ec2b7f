"""Analyzer chain: tokenizer + token filters, vectorized over pandas Series.

Semantics mirror the reference's analysis package (study citations):
- ``Text`` tokenizer: ASCII-transliterate then ``[a-zA-Z]+`` matches
  (reference: src/Analysis/Analyzer/Common/Text.php:24-70)
- ``TextNum``: ``[a-zA-Z0-9]+`` (TextNum.php:47-70)
- ``Utf8`` / ``Utf8Num``: ``\\p{L}+`` / ``[\\p{L}\\p{N}]+`` (Utf8.php:70-105)
- LowerCase filter (LowerCase.php:24-33), StopWords (StopWords.php:46-53),
  ShortWords (ShortWords.php:29-48).

Position semantics (rank-critical): a filtered-out token leaves NO
position gap — surviving tokens are numbered consecutively 1..n
(reference: DocumentWriter.php:82-99 with the do/while null-skip loop in
Text.php:53-68). Norm length = number of SURVIVING tokens.

The hot path is :meth:`Analyzer.tokenize_series`, which runs whole
pandas Series through compiled regex + numpy — no per-row Python beyond
``str.findall`` (C-looped in pandas) — suitable for Arrow-batched
``mapInPandas``.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# A pragmatic English stop list (the reference ships none by default —
# StopWords is opt-in, loaded from a file; StopWords.php:66-84). Kept
# small and fixed so tests and oracles can reproduce it.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)


@dataclass(frozen=True)
class Token:
    """(termText, startOffset, endOffset, positionIncrement) —
    reference: src/Analysis/Token.php:11-90."""

    text: str
    start: int
    end: int
    position_increment: int = 1


_ASCII_TRANSLIT = {
    ord(c): t
    for c, t in [
        ("ä", "a"), ("ö", "o"), ("ü", "u"),
        ("Ä", "A"), ("Ö", "O"), ("Ü", "U"),
        ("ß", "ss"), ("é", "e"), ("è", "e"),
        ("ê", "e"), ("à", "a"), ("â", "a"),
        ("ç", "c"), ("ñ", "n"),
    ]
}


def ascii_translit(s: str) -> str:
    """Approximate the reference's iconv //TRANSLIT: NFKD-decompose and
    drop combining marks, then strip non-ASCII."""
    s = s.translate(_ASCII_TRANSLIT)
    if s.isascii():
        return s
    d = unicodedata.normalize("NFKD", s)
    return "".join(c for c in d if c.isascii())


@dataclass(frozen=True)
class Analyzer:
    """Tokenizer regex + filter chain. Immutable and broadcast-safe."""

    token_pattern: str
    lowercase: bool = False
    stop_words: frozenset[str] = field(default_factory=frozenset)
    min_length: int = 0  # ShortWords filter threshold; 0 = off
    translit: bool = False  # ASCII transliteration before tokenizing
    name: str = "custom"

    def __post_init__(self):
        object.__setattr__(self, "_rx", re.compile(self.token_pattern))

    # ---- single-string path (driver-side query analysis, tests) ----
    def tokens(self, text: str) -> list[Token]:
        if text is None:
            return []
        src = ascii_translit(text) if self.translit else text
        out: list[Token] = []
        for m in self._rx.finditer(src):
            t = m.group(0)
            if self.lowercase:
                t = t.lower()
            if self.stop_words and t in self.stop_words:
                continue
            if self.min_length and len(t) < self.min_length:
                continue
            out.append(Token(t, m.start(), m.end()))
        return out

    def terms(self, text: str) -> list[str]:
        return [t.text for t in self.tokens(text)]

    # ---- vectorized path (executor-side, Arrow batches) ----
    def count_series(self, texts: pd.Series) -> np.ndarray:
        """Surviving-token COUNTS (int64) — what norms/lengths need.

        Fast path: when no filter can change the match count (no stop
        words, no min-length), the count is ``str.count(pattern)`` —
        one C-level pass, no list materialization. This is what keeps
        the docs phase of the build from tokenizing the whole corpus
        twice (the inversion pass still needs the tokens themselves).
        Falls back to full tokenization otherwise."""
        if not self.stop_words and not self.min_length:
            s = texts.fillna("")
            if self.translit:
                mask = ~s.map(str.isascii)
                if mask.any():
                    s = s.copy()
                    s[mask] = s[mask].map(ascii_translit)
            return s.str.count(self.token_pattern).to_numpy(np.int64)
        return self.tokenize_series(texts).map(len).to_numpy(np.int64)

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        """Series[str] → Series[list[str]] of surviving terms, in order."""
        s = texts.fillna("")
        if self.translit:
            mask = ~s.map(str.isascii)
            if mask.any():
                s = s.copy()
                s[mask] = s[mask].map(ascii_translit)
        toks = s.str.findall(self.token_pattern)
        if self.lowercase:
            toks = toks.map(lambda xs: [x.lower() for x in xs])
        if self.stop_words:
            sw = self.stop_words
            toks = toks.map(lambda xs: [x for x in xs if x not in sw])
        if self.min_length:
            n = self.min_length
            toks = toks.map(lambda xs: [x for x in xs if len(x) >= n])
        return toks


# Tokenizer presets (reference: Analysis/Analyzer/Common/*)
TEXT = "[a-zA-Z]+"
TEXT_NUM = "[a-zA-Z0-9]+"
UTF8 = r"[^\W\d_]+"  # \p{L}+ equivalent in Python re
UTF8_NUM = r"[^\W_]+"  # \p{L}\p{N}+ equivalent


def text_ci(stop_words=frozenset(), min_length=0) -> Analyzer:
    """Text\\CaseInsensitive — THE reference default
    (src/Analysis/Analyzer/Analyzer.php:39-46)."""
    return Analyzer(TEXT, lowercase=True, stop_words=frozenset(stop_words),
                    min_length=min_length, translit=True, name="text_ci")


def text_num_ci(stop_words=frozenset(), min_length=0) -> Analyzer:
    return Analyzer(TEXT_NUM, lowercase=True, stop_words=frozenset(stop_words),
                    min_length=min_length, translit=True, name="text_num_ci")


def utf8_ci(stop_words=frozenset(), min_length=0) -> Analyzer:
    return Analyzer(UTF8, lowercase=True, stop_words=frozenset(stop_words),
                    min_length=min_length, name="utf8_ci")


def utf8_num_ci(stop_words=frozenset(), min_length=0) -> Analyzer:
    return Analyzer(UTF8_NUM, lowercase=True, stop_words=frozenset(stop_words),
                    min_length=min_length, name="utf8_num_ci")


def default_analyzer() -> Analyzer:
    return text_ci()


def tokenize_to_numpy(
    analyzer: Analyzer, texts: pd.Series
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch: returns (row_idx, term, position_1based) arrays.

    position is 1-based over surviving tokens, matching the reference's
    per-field position counter (DocumentWriter.php:82-99).
    """
    tok_lists = analyzer.tokenize_series(texts)
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    row_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
    if lens.sum() == 0:
        return row_idx, np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    terms = np.concatenate([np.asarray(x, dtype=object) for x in tok_lists if x])
    ends = np.cumsum(lens)
    starts = ends - lens
    pos = np.arange(ends[-1], dtype=np.int64) - np.repeat(starts, lens) + 1
    return row_idx, terms, pos
