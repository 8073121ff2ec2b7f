"""Query-term highlighting (reference §2.10).

Reference: per-query ``_highlightMatches`` walks the REWRITTEN tree so
wildcard/fuzzy/range expansions highlight their matched dictionary
terms, and the DOM highlighter wraps hits in colored <b> spans
(src/Search/Highlighter/DefaultHighlighter.php:13-75,
Query/Term.php:205-208, Wildcard.php:333-356, Fuzzy.php:410-462).

Spark shape: term extraction is driver-side (walk the rewritten query),
highlighting is ONE ``regexp_replace`` projection — JVM regex, codegen,
no UDF — applied to a text column. Token-boundary anchors match the
analyzer's word pattern so only whole analyzed tokens are wrapped.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.search.query import (
    BooleanQuery,
    MultiTermQuery,
    PhraseQuery,
    Query,
    TermQuery,
)


def highlight_terms(q: Query, field: str | None = None) -> list[str]:
    """Terms a REWRITTEN query tree would highlight (prohibited clauses
    excluded, like the reference's per-query _highlightMatches)."""
    out: list[str] = []
    seen = set()

    def add(t):
        if (field is None or t.field == field) and t.text not in seen:
            seen.add(t.text)
            out.append(t.text)

    def walk(n: Query):
        if isinstance(n, TermQuery):
            add(n.term)
        elif isinstance(n, MultiTermQuery):
            for i, t in enumerate(n.terms):
                s = None if n.signs is None else n.signs[i]
                if s is not False:
                    add(t)
        elif isinstance(n, PhraseQuery):
            for t in n.terms:
                add(t)
        elif isinstance(n, BooleanQuery):
            for i, sub in enumerate(n.subqueries):
                s = None if n.signs is None else n.signs[i]
                if s is not False:
                    walk(sub)

    walk(q)
    return out


def highlight_column(
    text: Column | str,
    terms: list[str],
    pre: str = "<b>",
    post: str = "</b>",
) -> Column:
    """Wrap analyzed-token matches of ``terms`` in pre/post markers —
    one case-insensitive JVM regexp_replace, whole-token anchored."""
    c = F.col(text) if isinstance(text, str) else text
    if not terms:
        return c
    alts = "|".join(re.escape(t) for t in sorted(terms, key=len, reverse=True))
    pattern = f"(?i)(?<![a-zA-Z0-9])({alts})(?![a-zA-Z0-9])"
    return F.regexp_replace(c, pattern, f"{pre}$1{post}")


def highlight(
    df: DataFrame, text_col: str, q: Query, out_col: str = "highlighted",
    pre: str = "<b>", post: str = "</b>",
) -> DataFrame:
    """DataFrame surface: add ``out_col`` with query terms highlighted."""
    terms = highlight_terms(q)
    return df.withColumn(
        out_col, highlight_column(F.col(text_col), terms, pre, post)
    )
