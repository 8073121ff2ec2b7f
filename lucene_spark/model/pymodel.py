"""Pure-Python single-process model of the engine — the test oracle.

A complete in-memory re-implementation of the reference's index + search
semantics (including every rank-affecting quirk from SURVEY.md §4.3).
The Spark engine is validated against this model on synthetic corpora;
the model itself is validated against the reference's golden numbers
(tests/SearchTest.php score lists).

Quirks reproduced in ``classic`` mode:
1. norm byte quantization through the 256-entry codebook
   (DocumentWriter.php:106-109, SegmentInfo.php:1469-1482)
2. idf over maxDoc INCLUDING deleted docs (src/Index.php:504-517)
3. single top-level queryNorm; weight composition W7-W9 with the
   ``ssw==0 → 1.0`` fallback (Weight/MultiTerm.php:92-95)
4. Boolean conjunction double-coord (Boolean.php:655-665)
5. resultSetLimit truncates PRE-sort in docId order; top-score
   normalization (if top > 1) happens after truncation
   (src/Index.php:705-735)
6. phrase freq algorithms exact/sloppy (Phrase.php:378-491)
7. sort: score desc, docId asc (src/Index.php:739-741)
"""

from __future__ import annotations

import math
from bisect import bisect_left
from dataclasses import dataclass

from lucene_spark.analysis import Analyzer, default_analyzer
from lucene_spark.codec.norms import decode_norm, encode_norm
from lucene_spark.search.query import (
    BooleanQuery,
    EmptyResult,
    Insignificant,
    MultiTermQuery,
    PhraseQuery,
    Query,
    Term,
    TermQuery,
)
from lucene_spark.search.similarity import (
    BM25_B,
    BM25_K1,
    bm25_idf,
    bm25_partial,
    get_default,
)
from lucene_spark.search.parser import parse_query


@dataclass
class Hit:
    doc_id: int
    score: float


class PyIndex:
    """In-memory inverted index + searcher (IndexReader protocol)."""

    def __init__(
        self,
        analyzer: Analyzer | None = None,
        field_policy: dict[str, str] | None = None,
        default_field: str | None = None,
        field_boosts: dict[str, float] | None = None,
    ):
        self.an = analyzer or default_analyzer()
        # field -> 'text' (tokenized) | 'keyword' (single term, pos 0)
        self.field_policy = field_policy or {}
        # index-time per-field boost, folded into the norm byte
        # (reference: Document/Field.php boost, DocumentWriter.php:106-109)
        self.field_boosts = field_boosts or {}
        self._default_field = default_field
        # postings[(field, term)] = {doc_id: [positions]}
        self.postings: dict[tuple[str, str], dict[int, list[int]]] = {}
        self.norm_bytes: dict[str, dict[int, int]] = {}  # field -> doc -> byte
        self.field_lens: dict[str, dict[int, int]] = {}  # surviving-token counts
        self.stored: list[dict] = []
        self.n_docs = 0
        self.deleted: set[int] = set()
        self._sorted_terms_cache: dict[str, list[str]] = {}
        self._field_order: list[str] = []  # first-seen ≙ .fnm order

    # ----------------------------------------------------------- build
    def add_document(
        self,
        fields: dict[str, str],
        boost: float = 1.0,
        field_boosts: dict[str, float] | None = None,
    ) -> int:
        """``boost`` ≙ Document.php boost; ``field_boosts`` ≙ the
        per-Field-INSTANCE boosts of this document (Field.php), composed
        with the index-wide ``self.field_boosts``."""
        doc_id = self.n_docs
        self.n_docs += 1
        self.stored.append(fields)
        for name, value in fields.items():
            kind = self.field_policy.get(name, "text")
            if value is None or kind == "ignore":
                continue
            if name not in self._field_order:
                self._field_order.append(name)
            if kind == "keyword":
                terms = [str(value)]
                positions = [0]
            else:
                terms = self.an.terms(str(value))
                positions = list(range(1, len(terms) + 1))
                # empty tokenized fields are non-indexed: no norm entry
                # (reference: DocumentWriter.php:101-104)
                if not terms:
                    continue
            for t, p in zip(terms, positions):
                self.postings.setdefault((name, t), {}).setdefault(doc_id, []).append(p)
            n = len(terms)
            self.field_lens.setdefault(name, {})[doc_id] = n
            # norm = lengthNorm · docBoost · fieldBoost
            # (DocumentWriter.php:106-109,131-133; keyword lengthNorm(1)=1)
            fb = self.field_boosts.get(name, 1.0)
            if field_boosts and name in field_boosts:
                fb = field_boosts[name] * fb
            ln = (
                float(get_default().length_norm(n)) if kind == "text" else 1.0
            )
            norm = ln * boost * fb
            self.norm_bytes.setdefault(name, {})[doc_id] = encode_norm(norm)
        self._sorted_terms_cache.clear()
        return doc_id

    # ------------------------------------------------- reader protocol
    def field_names(self, indexed_only: bool = True) -> list[str]:
        # first-seen order, like the reference's .fnm field table
        # (AbstractSegmentWriter.php:203-219) — rewrite fan-out order
        # and expansion term order depend on it
        return list(self._field_order)

    def has_term(self, term: Term) -> bool:
        return (term.field, term.text) in self.postings

    def _sorted_terms(self, field: str) -> list[str]:
        c = self._sorted_terms_cache.get(field)
        if c is None:
            c = sorted(t for (f, t) in self.postings if f == field)
            self._sorted_terms_cache[field] = c
        return c

    def terms_from(self, field: str, start: str = ""):
        ts = self._sorted_terms(field)
        for i in range(bisect_left(ts, start), len(ts)):
            yield ts[i]

    def analyzer(self):
        return self.an

    def default_search_field(self):
        return self._default_field

    def set_default_search_field(self, field: str | None) -> None:
        """≙ Lucene::setDefaultSearchField (src/Lucene.php:92-104)."""
        self._default_field = field

    # -------------------------------------------------- postings reads
    def term_docs(self, term: Term) -> list[int]:
        p = self.postings.get((term.field, term.text), {})
        return sorted(p.keys())

    def term_freqs(self, term: Term) -> dict[int, int]:
        p = self.postings.get((term.field, term.text), {})
        return {d: len(ps) for d, ps in sorted(p.items())}

    def term_positions(self, term: Term) -> dict[int, list[int]]:
        p = self.postings.get((term.field, term.text), {})
        return {d: list(ps) for d, ps in sorted(p.items())}

    def doc_freq(self, term: Term) -> int:
        return len(self.postings.get((term.field, term.text), {}))

    def delete(self, doc_id: int) -> None:
        """Logical delete: doc stays in postings/dictionary (df and idf
        still count it — quirk §4.3.2) but its norm reads as 0, which
        zeroes its scores and drops it from hits (src/Index.php:1101-1103,
        :705-707)."""
        self.deleted.add(doc_id)
        self._sorted_terms_cache.clear()

    def norm(self, doc_id: int, field: str) -> float:
        if doc_id in self.deleted:
            return 0.0  # reference: Index::norm() → 0 for deleted docs
        b = self.norm_bytes.get(field, {}).get(doc_id)
        return decode_norm(b) if b is not None else 0.0

    def field_len(self, doc_id: int, field: str) -> int:
        return self.field_lens.get(field, {}).get(doc_id, 0)

    def avg_field_len(self, field: str) -> float:
        lens = self.field_lens.get(field, {})
        return (sum(lens.values()) / len(lens)) if lens else 0.0

    # ------------------------------------------------------ search API
    def find(
        self,
        query: str | Query,
        limit: int = 0,
        score_mode: str = "classic",
        default_operator: str = "OR",
    ) -> list[Hit]:
        """Reference Index::find lifecycle (src/Index.php:683-827)."""
        if isinstance(query, str):
            query = parse_query(
                query, self._default_field, default_operator=default_operator
            )
        q = query.rewrite(self).optimize(self)
        if isinstance(q, (Insignificant, EmptyResult)):
            return []
        if score_mode == "classic":
            scorer = _ClassicScorer(self, q)
        elif score_mode == "bm25":
            scorer = _BM25Scorer(self, q)
        else:
            raise ValueError(f"unknown score_mode {score_mode!r}")
        hits: list[Hit] = []
        for doc_id in sorted(scorer.matched()):
            s = scorer.score(doc_id)
            if s != 0:
                hits.append(Hit(doc_id, s))
                # QUIRK: limit truncates in docId order, BEFORE sorting
                # (src/Index.php:705-724)
                if limit and len(hits) >= limit:
                    break
        if score_mode == "classic" and hits:
            top = max(h.score for h in hits)
            if top > 1:
                hits = [Hit(h.doc_id, h.score / top) for h in hits]
        hits.sort(key=lambda h: (-h.score, h.doc_id))
        return hits


# ------------------------------------------------------------ scorers


class _ClassicScorer:
    """Weight tree + matched-set algebra per the reference."""

    def __init__(self, index: PyIndex, q: Query):
        self.ix = index
        self.q = q
        # scoring hooks resolved once per query ≙ the reference reading
        # AbstractSimilarity::getDefault at weight-build time
        self.sim = get_default()
        ssw = self._sum_sq(q)
        self.query_norm = self.sim.query_norm(ssw)

    # --- weight machinery: value(term) = idf² · ownerBoost · queryNorm·chain
    def _sum_sq(self, q: Query) -> float:
        if isinstance(q, TermQuery):
            idf = self.sim.idf(self.ix.doc_freq(q.term), self.ix.n_docs)
            w = idf * q.boost
            return w * w
        if isinstance(q, MultiTermQuery):
            s = 0.0
            for i, t in enumerate(q.terms):
                sign = True if q.signs is None else q.signs[i]
                if sign is False:
                    continue
                idf = self.sim.idf(self.ix.doc_freq(t), self.ix.n_docs)
                w = idf * q.boost  # term weight owner is the MultiTerm
                s += w * w
            s *= q.boost * q.boost
            return s if s != 0 else 1.0
        if isinstance(q, BooleanQuery):
            s = sum(self._sum_sq(sub) for sub in q.subqueries)
            s *= q.boost * q.boost
            return s if s != 0 else 1.0
        if isinstance(q, PhraseQuery):
            idf = sum(
                self.sim.idf(self.ix.doc_freq(t), self.ix.n_docs) for t in q.terms
            )
            w = idf * q.boost
            return w * w
        return 0.0

    def matched(self) -> set[int]:
        return self._matched(self.q)

    def _matched(self, q: Query) -> set[int]:
        ix = self.ix
        if isinstance(q, TermQuery):
            return set(ix.term_docs(q.term))
        if isinstance(q, MultiTermQuery):
            if q.signs is None:
                sets = [set(ix.term_docs(t)) for t in q.terms]
                return set.intersection(*sets) if sets else set()
            required = [
                set(ix.term_docs(t))
                for t, s in zip(q.terms, q.signs)
                if s is True
            ]
            optional = [
                set(ix.term_docs(t))
                for t, s in zip(q.terms, q.signs)
                if s is None
            ]
            prohibited = [
                set(ix.term_docs(t))
                for t, s in zip(q.terms, q.signs)
                if s is False
            ]
            if required:
                res = set.intersection(*required)
            else:
                res = set().union(*optional) if optional else set()
            for p in prohibited:
                res -= p
            return res
        if isinstance(q, BooleanQuery):
            subs = [self._matched(s) for s in q.subqueries]
            if q.signs is None:
                return set.intersection(*subs) if subs else set()
            required = [m for m, s in zip(subs, q.signs) if s is True]
            optional = [m for m, s in zip(subs, q.signs) if s is None]
            if required:
                return set.intersection(*required)
            # prohibited NOT subtracted here — handled at score time
            # (Boolean.php:556-562)
            return set().union(*optional) if optional else set()
        if isinstance(q, PhraseQuery):
            sets = [set(ix.term_docs(t)) for t in q.terms]
            return set.intersection(*sets) if sets else set()
        return set()

    def score(self, doc_id: int) -> float:
        return self._score(self.q, doc_id, self.query_norm)

    def _term_value(self, term: Term, owner_boost: float, qn: float) -> float:
        idf = self.sim.idf(self.ix.doc_freq(term), self.ix.n_docs)
        # Weight\Term: value = (idf·boost·queryNorm)·idf (Weight/Term.php:76-103)
        return idf * owner_boost * qn * idf

    def _score(self, q: Query, doc_id: int, qn: float) -> float:
        ix = self.ix
        if isinstance(q, TermQuery):
            freqs = ix.term_freqs(q.term)
            if doc_id not in freqs:
                return 0.0
            return (
                self.sim.tf(freqs[doc_id])
                * self._term_value(q.term, q.boost, qn)
                * ix.norm(doc_id, q.term.field)
                * q.boost
            )
        if isinstance(q, MultiTermQuery):
            if doc_id not in self._matched(q):
                return 0.0
            # term weights owned by the MultiTerm; child queryNorm gets
            # ×boost (Weight/MultiTerm.php:103-113)
            child_qn = qn * q.boost
            if q.signs is None:
                score = 0.0
                for t in q.terms:
                    freqs = ix.term_freqs(t)
                    score += (
                        self.sim.tf(freqs[doc_id])
                        * self._term_value(t, q.boost, child_qn)
                        * ix.norm(doc_id, t.field)
                    )
                coord = self.sim.coord(len(q.terms), len(q.terms))
                return score * coord * q.boost
            max_coord = sum(1 for s in q.signs if s is not False)
            score = 0.0
            matched_terms = 0
            for t, s in zip(q.terms, q.signs):
                if s is False:
                    continue
                freqs = ix.term_freqs(t)
                if doc_id in freqs:
                    matched_terms += 1
                    score += (
                        self.sim.tf(freqs[doc_id])
                        * self._term_value(t, q.boost, child_qn)
                        * ix.norm(doc_id, t.field)
                    )
            return score * self.sim.coord(matched_terms, max_coord) * q.boost
        if isinstance(q, BooleanQuery):
            if doc_id not in self._matched(q):
                return 0.0
            child_qn = qn * q.boost
            if q.signs is None:
                coord = self.sim.coord(len(q.subqueries), len(q.subqueries))
                score = 0.0
                for sub in q.subqueries:
                    s = self._score(sub, doc_id, child_qn)
                    if s == 0:
                        return 0.0
                    # QUIRK: coord applied per-subscore AND once more below
                    # (Boolean.php:655-665)
                    score += s * coord
                return score * coord * q.boost
            max_coord = sum(1 for s in q.signs if s is not False)
            score = 0.0
            matched = 0
            for sub, sign in zip(q.subqueries, q.signs):
                s = self._score(sub, doc_id, child_qn)
                if sign is False and s != 0:
                    return 0.0
                if sign is True and s == 0:
                    return 0.0
                if sign is not False and s != 0:
                    matched += 1
                    score += s
            return score * self.sim.coord(matched, max_coord) * q.boost
        if isinstance(q, PhraseQuery):
            if doc_id not in self._matched(q):
                return 0.0
            freq = self._phrase_freq(q, doc_id)
            if freq == 0:
                return 0.0
            idf = sum(
                self.sim.idf(ix.doc_freq(t), ix.n_docs) for t in q.terms
            )
            value = idf * q.boost * qn * idf
            return (
                self.sim.tf(freq)
                * value
                * ix.norm(doc_id, q.terms[0].field)
                * q.boost
            )
        return 0.0

    def _phrase_freq(self, q: PhraseQuery, doc_id: int) -> float:
        from lucene_spark.search.phrase import phrase_freq

        tp = [self.ix.term_positions(t)[doc_id] for t in q.terms]
        return phrase_freq(tp, q.offsets, q.slop, sf=self.sim.sloppy_freq)


class _BM25Scorer:
    """Production scoring: same matched-set algebra, BM25 term scores.

    score(doc) = Σ over matched non-prohibited leaf terms of
    boost · idf_bm25(df, N) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).
    Phrase freq replaces tf for phrase nodes. No coord/queryNorm.
    """

    def __init__(self, index: PyIndex, q: Query, k1: float = BM25_K1, b: float = BM25_B):
        self.ix = index
        self.q = q
        self.k1 = k1
        self.b = b
        self._classic = _ClassicScorer(index, q)  # reuse matched-set algebra

    def matched(self) -> set[int]:
        return self._classic.matched()

    def _term_score(self, t: Term, doc_id: int, boost: float) -> float:
        freqs = self.ix.term_freqs(t)
        if doc_id not in freqs:
            return 0.0
        if doc_id in self.ix.deleted:
            return 0.0
        dl = self.ix.field_len(doc_id, t.field)
        avgdl = self.ix.avg_field_len(t.field)
        return (
            boost
            * bm25_idf(self.ix.doc_freq(t), self.ix.n_docs)
            * bm25_partial(freqs[doc_id], dl, avgdl, self.k1, self.b)
        )

    def score(self, doc_id: int) -> float:
        # deleted docs stop matching immediately (reference: norm → 0
        # zeroes classic scores, src/Index.php:1116-1138); the BM25
        # extension has no norm factor, so gate here — _term_score's
        # own check cannot cover phrase/boolean nodes (round-5
        # lifecycle fuzzer finding)
        if doc_id in self.ix.deleted:
            return 0.0
        return self._score(self.q, doc_id)

    def _score(self, q: Query, doc_id: int) -> float:
        if isinstance(q, TermQuery):
            return self._term_score(q.term, doc_id, q.boost)
        if isinstance(q, MultiTermQuery):
            if doc_id not in self._classic._matched(q):
                return 0.0
            s = 0.0
            for i, t in enumerate(q.terms):
                sign = True if q.signs is None else q.signs[i]
                if sign is False:
                    continue
                s += self._term_score(t, doc_id, 1.0)
            return s * q.boost
        if isinstance(q, BooleanQuery):
            if doc_id not in self._classic._matched(q):
                return 0.0
            s = 0.0
            for i, sub in enumerate(q.subqueries):
                sign = True if q.signs is None else q.signs[i]
                sub_s = self._score(sub, doc_id)
                if sign is False and sub_s != 0:
                    return 0.0
                if sign is True and sub_s == 0:
                    return 0.0
                if sign is not False:
                    s += sub_s
            return s * q.boost
        if isinstance(q, PhraseQuery):
            if doc_id not in self._classic._matched(q):
                return 0.0
            freq = self._classic._phrase_freq(q, doc_id)
            if freq == 0:
                return 0.0
            dl = self.ix.field_len(doc_id, q.terms[0].field)
            avgdl = self.ix.avg_field_len(q.terms[0].field)
            df = min(self.ix.doc_freq(t) for t in q.terms)
            return (
                q.boost
                * bm25_idf(df, self.ix.n_docs)
                * bm25_partial(freq, dl, avgdl, self.k1, self.b)
            )
        return 0.0
