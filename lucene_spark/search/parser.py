"""Lucene query-string parser → preprocessing query tree.

Fresh implementation of the reference's lexer/parser behavior
(src/Search/QueryLexer.php, QueryParser.php, QueryParserContext.php,
BooleanExpressionRecognizer.php):

- entries: word, "quoted phrase", field:entry, (subquery), [a TO b] /
  {a TO b} ranges
- modifiers: +/- signs, ^boost, ~slop (phrase) / ~similarity (word)
- two styles per (sub)context, which must not be mixed: *signs style*
  (``+a -b c``) and *boolean style* (``a AND b OR NOT c``) with AND >
  OR precedence and unary NOT; boolean style is DNF-converted — each
  AND-conjunction becomes a signed Boolean clause, conjunctions are
  OR-combined as optional clauses; conjunctions containing only negated
  entries are dropped (QueryParserContext.php:121-364)
- AND/OR/NOT/TO operator lexemes match case-insensitively (QueryToken.php:32-36)
- ``\\x`` escapes any character inside words
- default operator is OR (bare entries optional) — QueryParser.php:24-25;
  ``default_operator="AND"`` makes unsigned signs-style entries REQUIRED
  (≙ ``QueryParser::setDefaultOperator(B_AND)``, applied at
  QueryParserContext.php:350-356 — explicit +/− signs win; boolean-style
  contexts are unaffected) and the error-suppression fallback adds its
  terms as required (QueryParser.php:363-365)

On parse error the reference falls back to a MultiTerm over all analyzer
tokens of the raw string (QueryParser.php:102-120); we expose that via
``parse_query(s, suppress_errors=True)``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from lucene_spark.search.query import (
    BooleanQuery,
    Insignificant,
    PrepFuzzyQuery,
    PrepPhraseQuery,
    PrepTermQuery,
    Query,
    RangeQuery,
    Term,
    DEFAULT_MIN_SIMILARITY,
)


class QueryParserError(ValueError):
    pass


# ---------------------------------------------------------------- lexer

_SYNTAX = set("()[]{}!|&:")


@dataclass
class Tok:
    kind: str  # word|phrase|field|required|prohibited|fuzzy|boost|lparen|rparen|lsq|rsq|lcurly|rcurly|number
    text: str = ""
    num: float | None = None


def _lex(s: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(s)

    def read_word(j: int) -> tuple[str, int]:
        out = []
        while j < n:
            c = s[j]
            if c == "\\" and j + 1 < n:
                out.append(s[j + 1])
                j += 2
                continue
            if c.isspace() or c in _SYNTAX or c in "+-^~\"":
                break
            out.append(c)
            j += 1
        return "".join(out), j

    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == '"':
            j = i + 1
            out = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    out.append(s[j + 1])
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            if j >= n:
                raise QueryParserError("Unclosed phrase quote")
            toks.append(Tok("phrase", "".join(out)))
            i = j + 1
        elif c == "(":
            toks.append(Tok("lparen")); i += 1
        elif c == ")":
            toks.append(Tok("rparen")); i += 1
        elif c == "[":
            toks.append(Tok("lsq")); i += 1
        elif c == "]":
            toks.append(Tok("rsq")); i += 1
        elif c == "{":
            toks.append(Tok("lcurly")); i += 1
        elif c == "}":
            toks.append(Tok("rcurly")); i += 1
        elif c == ":":
            toks.append(Tok("colon")); i += 1
        elif c == "+":
            toks.append(Tok("required")); i += 1
        elif c == "-":
            # '-' inside a word (e.g. mid-word hyphen after chars) is part
            # of the word only when the previous char isn't a separator;
            # the reference lexer treats it as mutable — sign when it
            # starts a lexeme.
            toks.append(Tok("prohibited")); i += 1
        elif c == "!":
            toks.append(Tok("word", "NOT")); i += 1
        elif c == "&" and s[i : i + 2] == "&&":
            toks.append(Tok("word", "AND")); i += 2
        elif c == "|" and s[i : i + 2] == "||":
            toks.append(Tok("word", "OR")); i += 2
        elif c in "~^":
            kind = "fuzzy" if c == "~" else "boost"
            m = re.match(r"[0-9]*\.?[0-9]+", s[i + 1 :])
            if m:
                toks.append(Tok(kind, num=float(m.group(0))))
                i += 1 + m.end()
            else:
                toks.append(Tok(kind))
                i += 1
        else:
            w, j = read_word(i)
            if not w:
                raise QueryParserError(f"Unexpected character {c!r} at {i}")
            toks.append(Tok("word", w))
            i = j
    return toks


# --------------------------------------------------------------- parser


@dataclass
class _Entry:
    query: Query
    sign: bool | None = None  # signs-style sign
    op_not: bool = False  # boolean-style NOT


class _Parser:
    def __init__(
        self,
        toks: list[Tok],
        default_field: str | None,
        default_operator: str = "OR",
    ):
        self.toks = toks
        self.pos = 0
        self.default_field = default_field
        self.default_operator = default_operator

    def peek(self) -> Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    # context = sequence of entries until rparen/EOF
    def parse_context(self, stop_at_rparen: bool) -> Query:
        entries: list[_Entry] = []
        ops: list[str | None] = []  # operator BEFORE entries[i] (AND/OR), boolean style
        has_signs = False
        has_ops = False
        pending_sign: bool | None = None
        pending_not = False
        pending_op: str | None = None

        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "rparen":
                if stop_at_rparen:
                    self.next()
                    break
                raise QueryParserError("Unmatched )")
            if t.kind == "required":
                self.next()
                pending_sign = True
                has_signs = True
                continue
            if t.kind == "prohibited":
                self.next()
                pending_sign = False
                has_signs = True
                continue
            # operator lexemes match case-insensitively ('AND' or 'and'
            # — reference QueryToken.php:32-34,79-86)
            if (
                t.kind == "word"
                and t.text.lower() in ("and", "or")
                and not pending_not
            ):
                self.next()
                pending_op = t.text.upper()
                has_ops = True
                continue
            if t.kind == "word" and t.text.lower() == "not":
                self.next()
                pending_not = True
                has_ops = True
                continue

            q = self.parse_entry()
            q = self.parse_modifiers(q)
            entries.append(_Entry(q, pending_sign, pending_not))
            ops.append(pending_op)
            pending_sign = None
            pending_not = False
            pending_op = None

        if pending_op is not None or pending_not:
            raise QueryParserError("Query ends with an operator")
        if has_signs and has_ops:
            raise QueryParserError(
                "Boolean operators and signs can't be mixed in one subquery"
            )
        if not entries:
            return Insignificant()
        if has_ops:
            return self._boolean_style(entries, ops)
        return self._signs_style(entries)

    def _signs_style(self, entries: list[_Entry]) -> Query:
        # the reference NEVER collapses a single sign-style entry — the
        # Boolean wrapper stays (QueryParserContext::_signStyleExpressionQuery),
        # which is why top-level rewrites print as '(sub)' even for one
        # entry; optimize() collapses later. With default_operator AND,
        # unsigned entries become required (the ?? $defaultSign fallback,
        # QueryParserContext.php:350-358) — explicit signs still win.
        default_sign = True if self.default_operator == "AND" else None
        q = BooleanQuery()
        for e in entries:
            q.add_subquery(e.query, e.sign if e.sign is not None else default_sign)
        return q

    def _boolean_style(self, entries: list[_Entry], ops: list[str | None]) -> Query:
        # split into OR-separated conjunctions (AND binds tighter; a bare
        # juxtaposition inside boolean style behaves like the default OR)
        conjunctions: list[list[_Entry]] = [[entries[0]]]
        for e, op in zip(entries[1:], ops[1:]):
            if op == "AND":
                conjunctions[-1].append(e)
            else:  # OR or bare
                conjunctions.append([e])

        clauses: list[Query] = []
        for conj in conjunctions:
            positives = [e for e in conj if not e.op_not]
            if not positives:
                continue  # only-negative conjunction dropped
            if len(conj) == 1:
                clauses.append(conj[0].query)
            else:
                sub = BooleanQuery()
                for e in conj:
                    sub.add_subquery(e.query, False if e.op_not else True)
                clauses.append(sub)
        if not clauses:
            return Insignificant()
        if len(clauses) == 1:
            return clauses[0]
        outer = BooleanQuery()
        for c in clauses:
            outer.add_subquery(c, None)
        return outer

    def parse_entry(self) -> Query:
        t = self.next()
        if t.kind == "lparen":
            return self.parse_context(stop_at_rparen=True)
        if t.kind in ("lsq", "lcurly"):
            return self.parse_range(t.kind == "lsq", field=self.default_field)
        if t.kind == "phrase":
            return PrepPhraseQuery(t.text, self.default_field)
        if t.kind == "word":
            word = t.text
            nxt = self.peek()
            if nxt is not None and nxt.kind == "colon":
                self.next()
                field = word
                t2 = self.peek()
                if t2 is None:
                    raise QueryParserError(f"Field '{field}:' without a value")
                if t2.kind in ("lsq", "lcurly"):
                    self.next()
                    return self.parse_range(t2.kind == "lsq", field=field)
                if t2.kind == "phrase":
                    self.next()
                    return PrepPhraseQuery(t2.text, field)
                if t2.kind == "lparen":
                    self.next()
                    sub = _Parser(self._collect_paren(), field, self.default_operator)
                    return sub.parse_context(stop_at_rparen=False)
                if t2.kind == "word":
                    self.next()
                    return PrepTermQuery(t2.text, field)
                raise QueryParserError(f"Bad token after '{field}:'")
            return PrepTermQuery(word, self.default_field)
        raise QueryParserError(f"Unexpected token {t.kind}")

    def _collect_paren(self) -> list[Tok]:
        depth = 1
        out: list[Tok] = []
        while True:
            t = self.peek()
            if t is None:
                raise QueryParserError("Unmatched (")
            self.next()
            if t.kind == "lparen":
                depth += 1
            elif t.kind == "rparen":
                depth -= 1
                if depth == 0:
                    return out
            out.append(t)

    def parse_range(self, inclusive: bool, field: str | None) -> Query:
        lo = self.next()
        if lo.kind not in ("word", "phrase"):
            raise QueryParserError("Bad range lower bound")
        to = self.next()
        if to.kind != "word" or to.text.lower() != "to":
            raise QueryParserError("Range must be '[lower TO upper]'")
        up = self.next()
        if up.kind not in ("word", "phrase"):
            raise QueryParserError("Bad range upper bound")
        close = self.next()
        if close.kind not in ("rsq", "rcurly"):
            raise QueryParserError("Unclosed range")
        lower = None if lo.text.lower() == "null" else lo.text
        upper = None if up.text.lower() == "null" else up.text
        # range terms go through the analyzer like the reference's
        # QueryEntry; we keep raw text lowercased at rewrite time instead
        return RangeQuery(
            Term(lower, field) if lower is not None else None,
            Term(upper, field) if upper is not None else None,
            inclusive,
        )

    def parse_modifiers(self, q: Query) -> Query:
        while True:
            t = self.peek()
            if t is None:
                return q
            if t.kind == "fuzzy":
                self.next()
                if isinstance(q, PrepPhraseQuery):
                    q.slop = int(t.num) if t.num is not None else 0
                elif isinstance(q, PrepTermQuery):
                    sim = t.num if t.num is not None else DEFAULT_MIN_SIMILARITY
                    q = PrepFuzzyQuery(q.word, q.field, sim).set_boost(q.boost)
                else:
                    raise QueryParserError("'~' modifier is not applicable here")
            elif t.kind == "boost":
                self.next()
                if t.num is None:
                    raise QueryParserError("'^' must be followed by a number")
                q.set_boost(q.boost * t.num)
            else:
                return q


def parse_query(
    s: str,
    default_field: str | None = None,
    suppress_errors: bool = False,
    analyzer=None,
    default_operator: str = "OR",
) -> Query:
    """Parse a Lucene query string into a preprocessing query tree.

    ``default_operator``: 'OR' (reference default — bare terms optional)
    or 'AND' (``QueryParser::setDefaultOperator(B_AND)`` — bare terms
    required)."""
    if default_operator not in ("OR", "AND"):
        raise ValueError(f"default_operator must be 'OR' or 'AND', got {default_operator!r}")
    try:
        toks = _lex(s)
        return _Parser(toks, default_field, default_operator).parse_context(
            stop_at_rparen=False
        )
    except QueryParserError:
        if not suppress_errors or analyzer is None:
            raise
        # reference fallback: MultiTerm over all tokens of the raw string
        # (QueryParser.php:102-120,363-371) — terms optional under OR,
        # required under B_AND
        fallback_sign = True if default_operator == "AND" else None
        q = BooleanQuery()
        for term_text in analyzer.terms(s):
            q.add_subquery(PrepTermQuery(term_text, default_field), fallback_sign)
        return q
