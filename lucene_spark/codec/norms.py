"""Lucene norm byte codebook (5-bit exponent / 3-bit mantissa smallfloat).

The reference stores per-(doc, field) length norms quantized to one byte
via a 256-entry codebook and decodes at score time
(reference: src/Search/Similarity/AbstractSimilarity.php:32-287 table,
:344-387 encode binary search, :324-327 decode). Quantization is
rank-affecting, so classic-parity scoring must go through this codebook.

The table is the standard Lucene ``byte315`` smallfloat: for byte b>0,
value = float32 with bit pattern ``(b << 21) + (48 << 24)``. Encoding
rounds to the nearest table entry with ties rounding DOWN (the
reference's ``$f - t[hi] > t[hi+1] - $f`` strict comparison), negatives
and zero map to byte 0, overflow saturates at byte 255.
"""

from __future__ import annotations

import numpy as np


def _build_table() -> np.ndarray:
    b = np.arange(256, dtype=np.uint32)
    bits = (b << 21) + (np.uint32(48) << 24)
    vals = bits.view(np.float32).astype(np.float64)
    vals[0] = 0.0
    return vals


NORM_TABLE: np.ndarray = _build_table()


def encode_norm_array(f: np.ndarray) -> np.ndarray:
    """Vectorized float→byte quantization with reference tie behavior."""
    x = np.asarray(f, dtype=np.float64)
    # searchsorted('right') - 1 = index of largest entry <= x
    hi = np.searchsorted(NORM_TABLE, x, side="right") - 1
    hi = np.clip(hi, 0, 255)
    up = np.minimum(hi + 1, 255)
    # round to nearest; strict '>' keeps exact midpoints on the low side
    bump = (hi != 255) & ((x - NORM_TABLE[hi]) > (NORM_TABLE[up] - x))
    out = np.where(bump, hi + 1, hi)
    out = np.where(x <= 0.0, 0, out)
    return out.astype(np.uint8)


def decode_norm_array(bytes_arr: np.ndarray) -> np.ndarray:
    return NORM_TABLE[np.asarray(bytes_arr, dtype=np.int64) & 0xFF]


def encode_norm(f: float) -> int:
    return int(encode_norm_array(np.asarray([f]))[0])


def decode_norm(b: int) -> float:
    return float(NORM_TABLE[b & 0xFF])


def length_norm(num_tokens: np.ndarray | int) -> np.ndarray | float:
    """Reference DefaultSimilarity::lengthNorm — 1/sqrt(n), n==0 → 1e10
    (reference: src/Search/Similarity/DefaultSimilarity.php:22-29)."""
    n = np.asarray(num_tokens, dtype=np.float64)
    out = np.where(n == 0, 1e10, 1.0 / np.sqrt(np.maximum(n, 1e-300)))
    if np.isscalar(num_tokens) or getattr(num_tokens, "ndim", 1) == 0:
        return float(out)
    return out
