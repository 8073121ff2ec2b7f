"""HTML document ingest (reference S4: Document\\HTML).

Reference behavior (src/Document/HTML.php:229-252 entry, :60-160 field
extraction, :185-197 text walk):
- ``title`` field = /html/head/title text
- one field per <meta name=... content=...> in head
- ``body`` field = concatenated text nodes under /html/body, skipping
  <script>, with a space appended after each text node whose parent is
  NOT an inline tag (so block boundaries never glue words together)
- ``links`` = href of every <a> / <area> (optionally skipping
  rel=nofollow)

Spark surface: :func:`parse_html` is a pure function (stdlib
html.parser — no external deps); :func:`html_fields` maps a DataFrame's
raw-HTML column to a struct of fields in one Arrow-batched pass, ready
to feed ``build_index`` with a {title: text, body: text} policy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# reference: HTML.php:55-61 — text after these tags glues to neighbors
INLINE_TAGS = frozenset(
    "a abbr acronym dfn em strong code samp kbd var b i big small strike "
    "tt u font span bdo cite del ins q sub sup".split()
)


@dataclass
class HtmlDoc:
    title: str = ""
    body: str = ""
    meta: dict = field(default_factory=dict)
    links: list = field(default_factory=list)


class _Extractor(HTMLParser):
    def __init__(self, exclude_nofollow: bool = False):
        super().__init__(convert_charrefs=True)
        self.doc = HtmlDoc()
        self.exclude_nofollow = exclude_nofollow
        self._stack: list[str] = []
        self._in_title = False
        self._in_body = False
        self._in_script = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        self._stack.append(tag)
        if tag == "title":
            self._in_title = True
        elif tag == "body":
            self._in_body = True
        elif tag == "script":
            self._in_script += 1
        elif tag == "meta" and "name" in a:
            self.doc.meta[a["name"]] = a.get("content", "")
            self._stack.pop()  # void element
        elif tag in ("a", "area"):
            href = a.get("href", "")
            if href and not (
                self.exclude_nofollow and a.get("rel", "").lower() == "nofollow"
            ):
                self.doc.links.append(href)
            if tag == "area":
                self._stack.pop()  # void element
        elif tag in ("br", "img", "hr", "input", "link"):
            self._stack.pop()  # void elements never close

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "body":
            self._in_body = False
        elif tag == "script":
            self._in_script = max(0, self._in_script - 1)
        while self._stack and self._stack[-1] != tag:
            self._stack.pop()
        if self._stack:
            self._stack.pop()

    def handle_data(self, data):
        if self._in_title:
            self.doc.title += data
        elif self._in_body and not self._in_script and data:
            self.doc.body += data
            parent = self._stack[-1] if self._stack else ""
            # space after non-inline parents (HTML.php:188-191)
            if parent not in INLINE_TAGS:
                self.doc.body += " "


def parse_html(data: str | bytes, encoding: str = "iso-8859-1") -> HtmlDoc:
    if isinstance(data, bytes):
        data = data.decode(encoding, errors="replace")
    p = _Extractor()
    # tolerate fragments: without <body>, treat everything as body
    if "<body" not in data.lower():
        p._in_body = True
    p.feed(data)
    p.doc.title = p.doc.title.strip()
    return p.doc


HTML_STRUCT = StructType(
    [
        StructField("title", StringType()),
        StructField("body", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
        StructField("links", ArrayType(StringType())),
    ]
)


def html_fields(df: DataFrame, html_col: str, out_col: str = "html") -> DataFrame:
    """Add ``out_col`` struct(title, body, meta, links) parsed from the
    raw-HTML string column — one Arrow-batched pass (the parse is the
    unavoidable Python; everything downstream stays declarative)."""
    schema = StructType(df.schema.fields + [StructField(out_col, HTML_STRUCT)])

    def kernel(batches):
        for pdf in batches:
            parsed = [
                None
                if h is None
                else {
                    "title": (d := parse_html(h)).title,
                    "body": d.body,
                    "meta": d.meta,
                    "links": d.links,
                }
                for h in pdf[html_col]
            ]
            yield pdf.assign(**{out_col: parsed})

    return df.mapInPandas(kernel, schema)
