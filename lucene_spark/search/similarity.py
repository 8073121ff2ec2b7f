"""Scoring primitives: classic (reference-parity) and BM25 (production).

Classic formulas (reference DefaultSimilarity):
- tf(freq) = sqrt(freq)                       (DefaultSimilarity.php:50-53)
- idf(df, N) = ln(N/(df+1)) + 1               (DefaultSimilarity.php:75-78)
- lengthNorm(n) = 1/sqrt(n), 0→1e10           (DefaultSimilarity.php:22-29)
- queryNorm(ssw) = 1/sqrt(ssw)                (DefaultSimilarity.php:38-41)
- coord(overlap, max) = overlap/max           (DefaultSimilarity.php:88-91)
- sloppyFreq(d) = 1/(d+1)                     (DefaultSimilarity.php:62-65)

BM25 is NOT in the reference; BASELINE.json mandates k1=1.2, b=0.75 for
the production path. We use the Lucene-standard idf:
``ln(1 + (N - df + 0.5)/(df + 0.5))`` and
``score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.
The same formula is emitted as Spark SQL, as the pure-Python model, and
as the DuckDB oracle SQL, so all three agree bit-for-bit.
"""

from __future__ import annotations

import math

BM25_K1 = 1.2
BM25_B = 0.75


def classic_tf(freq: float) -> float:
    return math.sqrt(freq)


def classic_idf(df: int, num_docs: int) -> float:
    return math.log(num_docs / (df + 1)) + 1.0


def classic_query_norm(sum_sq: float) -> float:
    return 1.0 / math.sqrt(sum_sq) if sum_sq > 0 else 1.0


def classic_coord(overlap: int, max_overlap: int) -> float:
    return overlap / max_overlap if max_overlap else 1.0


def sloppy_freq(distance: int) -> float:
    return 1.0 / (distance + 1.0)


def bm25_idf(df: int, num_docs: int) -> float:
    return math.log(1.0 + (num_docs - df + 0.5) / (df + 0.5))


def bm25_partial(tf: float, dl: float, avgdl: float,
                 k1: float = BM25_K1, b: float = BM25_B) -> float:
    """tf-and-length part of BM25 (idf applied by the caller)."""
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def bm25_score(tf, df, num_docs, dl, avgdl, k1=BM25_K1, b=BM25_B) -> float:
    return bm25_idf(df, num_docs) * bm25_partial(tf, dl, avgdl, k1, b)


# The same BM25 expression as SQL text, shared verbatim by the Spark
# executor (spark.sql expr) and the DuckDB oracle so the driver's
# value-hash comparison sees identical arithmetic.
def bm25_sql(tf: str, df: str, n: str, dl: str, avgdl: str,
             k1: float = BM25_K1, b: float = BM25_B) -> str:
    return (
        f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
        f"({tf} * ({k1} + 1.0) / ({tf} + {k1} * (1.0 - {b} + {b} * {dl} / {avgdl})))"
    )
