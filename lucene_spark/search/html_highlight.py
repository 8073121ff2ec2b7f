"""DOM-aware HTML highlighting (reference parity for HTML documents).

Reference semantics
(src/Search/Highlighter/DefaultHighlighter.php:13-75,
src/Document/HTML.php:277-430, Search/Query/AbstractQuery.php:136-178):

- ``highlightMatches(html)`` walks the REWRITTEN query tree; every
  query node that highlights calls ``highlighter->highlight(words)``
  once, and each call takes the NEXT color from a fixed 15-color
  rotation — so a Boolean of three clauses paints each clause's terms
  a different color.
- Only DOM text nodes are rewritten; ``<script>`` subtrees are skipped
  (HTML.php:357-361). Tags, attributes, comments and entity references
  pass through untouched.
- A matched token is wrapped in
  ``<b style="color:black;background-color:{color}">`` (HTML.php:278).

Spark shape: color planning (terms → colors) is driver-side; the HTML
walk is inherently imperative per document, so it runs as ONE
Arrow-batched pandas UDF over the html column — the same place the
reference pays a DOM parse per document. Plain-text columns should use
:mod:`lucene_spark.search.highlight` (pure Catalyst regexp) instead.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

from lucene_spark.analysis import default_analyzer
from lucene_spark.search.query import (
    BooleanQuery,
    MultiTermQuery,
    PhraseQuery,
    PrepFuzzyQuery,
    PrepPhraseQuery,
    PrepTermQuery,
    Query,
    TermQuery,
)

# DefaultHighlighter.php:20-26 — the reference's rotation, verbatim.
HIGHLIGHT_COLORS = [
    "#66ffff", "#ff66ff", "#ffff66",
    "#ff8888", "#88ff88", "#8888ff",
    "#88dddd", "#dd88dd", "#dddd88",
    "#aaddff", "#aaffdd", "#ddaaff",
    "#ddffaa", "#ffaadd", "#ffddaa",
]


def color_groups(q: Query, field: str | None = None) -> list[tuple[list[str], str]]:
    """[(terms, color)] in the reference's highlight() call order: one
    call per highlighting query node, colors rotating per call.

    Call order mirrors each node's ``_highlightMatches``: Term and
    Phrase highlight their own terms in one call each (Term.php:205-208,
    Phrase.php:544-552); MultiTerm highlights all non-prohibited terms
    in ONE call (MultiTerm.php:628-643); Boolean recurses into
    non-prohibited subqueries, each getting its own call
    (Boolean.php:772-779).

    Pre-rewrite Prep* nodes highlight by RE-ANALYZING their word, no
    index needed (Preprocessing/Term.php:242-312, Phrase.php:215-242,
    Fuzzy.php:225-265): one highlight() call per node over the
    analyzed tokens. Wildcard words can't be expanded without a
    dictionary, so they contribute nothing here — pass the REWRITTEN
    query when wildcard/fuzzy expansions should highlight their
    matched dictionary terms.
    """
    groups: list[list[str]] = []
    an = default_analyzer()

    def terms_of(ts) -> list[str]:
        return [
            t.text for t in ts if field is None or t.field == field
        ]

    def walk(n: Query) -> None:
        if isinstance(n, TermQuery):
            groups.append(terms_of([n.term]))
        elif isinstance(n, MultiTermQuery):
            ts = [
                t
                for i, t in enumerate(n.terms)
                if n.signs is None or n.signs[i] is not False
            ]
            groups.append(terms_of(ts))
        elif isinstance(n, PhraseQuery):
            groups.append(terms_of(n.terms))
        elif isinstance(n, PrepTermQuery):
            if field is not None and n.field is not None and n.field != field:
                return
            if "*" in n.word or "?" in n.word:
                return  # wildcard — needs a dictionary (rewrite first)
            toks = an.terms(n.word)
            if toks:
                groups.append(toks)
        elif isinstance(n, PrepPhraseQuery):
            if field is not None and n.field is not None and n.field != field:
                return
            toks = an.terms(n.phrase)
            if toks:
                groups.append(toks)
        elif isinstance(n, PrepFuzzyQuery):
            # reference matches doc tokens by edit distance per doc;
            # statically we highlight the base token only
            if field is not None and n.field is not None and n.field != field:
                return
            toks = an.terms(n.word)
            if len(toks) == 1:
                groups.append(toks)
        elif isinstance(n, BooleanQuery):
            for i, sub in enumerate(n.subqueries):
                if n.signs is None or n.signs[i] is not False:
                    walk(sub)

    walk(q)
    return [
        (g, HIGHLIGHT_COLORS[i % len(HIGHLIGHT_COLORS)])
        for i, g in enumerate(groups)
    ]


def _wrap(token: str, color: str) -> str:
    # HTML.php:278 applyColour, verbatim markup
    return f'<b style="color:black;background-color:{color}">{token}</b>'


class _Rewriter(HTMLParser):
    """Streaming HTML rebuild: tags/comments/entities verbatim, text
    nodes token-matched and wrapped. <script> subtrees pass through
    raw (HTML.php:357-361 skips them)."""

    def __init__(self, token_re: re.Pattern, term_color: dict[str, str]):
        super().__init__(convert_charrefs=False)
        self.token_re = token_re
        self.term_color = term_color
        self.out: list[str] = []
        self._script = 0

    # --- verbatim passthrough events
    def handle_starttag(self, tag, attrs):
        self.out.append(self.get_starttag_text())
        if tag == "script":
            self._script += 1

    def handle_startendtag(self, tag, attrs):
        self.out.append(self.get_starttag_text())

    def handle_endtag(self, tag):
        self.out.append(f"</{tag}>")
        if tag == "script":
            self._script = max(0, self._script - 1)

    def handle_comment(self, data):
        self.out.append(f"<!--{data}-->")

    def handle_decl(self, decl):
        self.out.append(f"<!{decl}>")

    def handle_pi(self, data):
        self.out.append(f"<?{data}>")

    def handle_entityref(self, name):
        # defer to updatepos: HTMLParser fires this event for bare
        # '&name' (no trailing semicolon) too, so reconstructing
        # '&{name};' here would INSERT a byte the input never had —
        # updatepos receives the event's exact [i, j) source span and
        # re-emits it verbatim
        self._raw_span = True

    def handle_charref(self, name):
        self._raw_span = True

    def updatepos(self, i, j):
        if getattr(self, "_raw_span", False):
            self.out.append(self.rawdata[i:j])
            self._raw_span = False
        return super().updatepos(i, j)

    # --- the one rewriting event
    def handle_data(self, data):
        if self._script:
            self.out.append(data)
            return

        def repl(m: re.Match) -> str:
            color = self.term_color.get(m.group(0).lower())
            return _wrap(m.group(0), color) if color else m.group(0)

        self.out.append(self.token_re.sub(repl, data))


def highlight_html_text(
    html: str,
    groups: list[tuple[list[str], str]],
    token_pattern: str = "[a-zA-Z0-9]+",
) -> str:
    """Pure-Python kernel (testable without Spark): wrap analyzed-token
    matches in per-group colors, DOM text nodes only. First group
    claiming a term wins, like the reference's in-order DOM rewrites."""
    term_color: dict[str, str] = {}
    for terms, color in groups:
        for t in terms:
            term_color.setdefault(t.lower(), color)
    if not term_color:
        return html
    r = _Rewriter(re.compile(token_pattern), term_color)
    r.feed(html)
    r.close()
    return "".join(r.out)


def highlight_html_column(
    html: Column | str,
    groups: list[tuple[list[str], str]],
    token_pattern: str = "[a-zA-Z0-9]+",
) -> Column:
    """Arrow-batched pandas UDF applying :func:`highlight_html_text`
    per row — the only Python in the path, exactly where the reference
    pays its per-document DOM parse."""
    c = F.col(html) if isinstance(html, str) else html

    @F.pandas_udf(StringType())
    def _hl(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: highlight_html_text(x, groups, token_pattern)
            if x is not None
            else None
        )

    return _hl(c)


def highlight_matches(
    df: DataFrame,
    html_col: str,
    q: Query,
    out_col: str = "highlighted",
    field: str | None = None,
    token_pattern: str = "[a-zA-Z0-9]+",
) -> DataFrame:
    """DataFrame surface ≙ Query::highlightMatches
    (AbstractQuery.php:136-148): per-clause rotating colors through the
    DOM of ``html_col``. Pass the REWRITTEN query so wildcard/fuzzy
    expansions highlight their matched dictionary terms."""
    return df.withColumn(
        out_col,
        highlight_html_column(F.col(html_col), color_groups(q, field), token_pattern),
    )
