"""Analyzer tests — FIXTURES.md F3 (ports reference AnalysisTest expectations)."""

import pandas as pd

from lucene_spark.analysis import (
    Analyzer,
    TEXT,
    TEXT_NUM,
    text_ci,
    text_num_ci,
    utf8_num_ci,
    default_analyzer,
)
from lucene_spark.analysis.analyzers import tokenize_to_numpy


def test_text_tokenizer_offsets():
    a = Analyzer(TEXT, translit=True, name="text")
    toks = a.tokens("Word1 Word2 anotherWord")
    assert [(t.text, t.start, t.end) for t in toks] == [
        ("Word", 0, 4),
        ("Word", 6, 10),
        ("anotherWord", 12, 23),
    ]


def test_text_case_insensitive():
    assert text_ci().terms("Word1 Word2 anotherWord") == ["word", "word", "anotherword"]


def test_textnum_keeps_digits():
    a = Analyzer(TEXT_NUM, translit=True)
    assert a.terms("Word1 Word2 anotherWord") == ["Word1", "Word2", "anotherWord"]


def test_stop_words_filter():
    a = text_ci(stop_words={"word", "and", "or"})
    toks = a.tokens("Word1 Word2 anotherWord")
    assert [(t.text, t.start, t.end) for t in toks] == [("anotherword", 12, 23)]


def test_short_words_filter():
    a = text_ci(min_length=4)
    assert a.terms("Word1 and anotherWord") == ["word", "anotherword"]


def test_number_only_gives_zero_tokens():
    # SearchTest.php:249 — number-only input has no tokens under Text\CI
    assert default_analyzer().terms("123456787654321") == []


def test_utf8num_keeps_unicode():
    assert utf8_num_ci().terms("Déjà vu 42") == ["déjà", "vu", "42"]


def test_translit_strips_accents_for_ascii_tokenizer():
    assert text_ci().terms("café déjà") == ["cafe", "deja"]


def test_vectorized_matches_scalar():
    a = text_ci(stop_words={"the", "and"})
    texts = ["The quick AND brown", "", None, "a1b2c3", "123", "Hello World hello"]
    s = pd.Series(texts)
    vec = a.tokenize_series(s).tolist()
    for text, v in zip(texts, vec):
        assert v == a.terms(text or "")


def test_tokenize_to_numpy_positions_are_1based_no_gaps():
    # stop-filtered tokens leave NO position gap (DocumentWriter.php:82-99)
    a = text_ci(stop_words={"the"})
    row, terms, pos = tokenize_to_numpy(a, pd.Series(["the cat the hat"]))
    assert list(terms) == ["cat", "hat"]
    assert list(pos) == [1, 2]
    assert list(row) == [0, 0]


def test_tokenize_to_numpy_multirow():
    a = text_ci()
    row, terms, pos = tokenize_to_numpy(a, pd.Series(["a b", "", "c"]))
    assert list(row) == [0, 0, 2]
    assert list(terms) == ["a", "b", "c"]
    assert list(pos) == [1, 2, 1]


def test_count_series_matches_tokenize():
    import numpy as np
    import pandas as pd

    from lucene_spark.analysis import Analyzer
    from lucene_spark.analysis.analyzers import TEXT, TEXT_NUM, ENGLISH_STOP_WORDS

    texts = pd.Series(
        [
            "Hello World 123", "", None, "the quick brown fox", "a1b2c3",
            "Übung macht den Meister", "x" * 500, "tab tab tab!", "ONE two",
        ]
    )
    cases = [
        Analyzer(TEXT_NUM, lowercase=True),
        Analyzer(TEXT, lowercase=True, translit=True),
        Analyzer(TEXT, lowercase=True, stop_words=ENGLISH_STOP_WORDS),
        Analyzer(TEXT_NUM, lowercase=True, min_length=3),
    ]
    for an in cases:
        fast = an.count_series(texts)
        slow = an.tokenize_series(texts).map(len).to_numpy(np.int64)
        assert (fast == slow).all(), an
