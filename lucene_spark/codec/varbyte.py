"""Delta + varbyte posting codec, numpy-vectorized (no per-element Python).

Wire format matches the reference's VInt codec semantics — LSB-first
7-bit groups, 0x80 continuation bit on every byte except the last
(reference: src/Storage/File/AbstractFile.php:281-292 read, :364-372
write) — but our posting *blocks* store docIDs, TFs and position gaps as
three separate varbyte streams instead of the reference's interleaved
``.frq`` stream (AbstractSegmentWriter.php:371-380). Separate streams
let boolean/AND queries decode docIDs without touching TFs or positions.
``freq_stream_encode/decode`` reproduce the interleaved reference
encoding exactly for parity tests.

All encoders accept non-negative int arrays up to 2^63-1 (9 varbytes).
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def _vb_pack(v: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Shared packing body: (stream bytes, per-value end byte offsets).
    Vectorized O(maxbytes); the single source of the continuation-bit
    layout for both whole-array and sliced encoding."""
    # bytes needed per value (1..10)
    nb = np.ones(v.size, dtype=np.int64)
    x = v >> _SEVEN
    while x.any():
        nb += x > 0
        x >>= _SEVEN
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    maxb = int(nb.max())
    for j in range(maxb):
        mask = nb > j
        pos = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)) & _MASK7
        # continuation bit on all bytes except each value's last
        cont = np.where(nb[mask] - 1 > j, np.uint64(0x80), np.uint64(0))
        out[pos] = (byte | cont).astype(np.uint8)
    return out.tobytes(), ends


def vb_encode(values: np.ndarray) -> bytes:
    """Varbyte-encode a non-negative integer array. Vectorized O(maxbytes)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _vb_pack(v)[0]


def vb_encode_sliced(values: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Encode ONE array, return per-slice streams: slice i covers values
    [bounds[i], bounds[i+1]). Byte-identical to calling :func:`vb_encode`
    on each slice (varbyte is per-value independent), but the encode —
    the dominant per-block cost in the segment inverter — runs once over
    the whole segment instead of once per 128-posting block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bounds = np.asarray(bounds, dtype=np.int64)
    if v.size == 0:
        return [b""] * max(len(bounds) - 1, 0)
    buf, ends = _vb_pack(v)
    # value-index bounds → byte offsets; tolist() first so the slice
    # loop runs on Python ints (np-scalar slice indices cost ~2.6× —
    # this loop runs once per posting block per stream)
    byte_off = np.concatenate(([0], ends))[bounds].tolist()
    return [buf[a:z] for a, z in zip(byte_off[:-1], byte_off[1:])]


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode a varbyte stream to uint64 array. Vectorized O(maxbytes)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    last = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty(last.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = last[:-1] + 1
    lengths = last - starts + 1
    vals = np.zeros(last.size, dtype=np.uint64)
    maxb = int(lengths.max())
    for j in range(maxb):
        mask = lengths > j
        vals[mask] |= (b[starts[mask] + j].astype(np.uint64) & _MASK7) << np.uint64(
            7 * j
        )
    return vals


def delta_encode(sorted_vals: np.ndarray, base: int = 0) -> np.ndarray:
    """Gaps of a sorted array relative to ``base`` (first gap = v0 - base)."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    return np.diff(v, prepend=np.int64(base)).astype(np.uint64)


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    return np.cumsum(g) + np.int64(base)


def encode_posting_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray | None,
    base: int = 0,
) -> tuple[bytes, bytes, bytes]:
    """Pack one posting block (ascending doc_ids) into three streams.

    - docs stream: varbyte(delta(doc_ids, base))
    - tf stream:   varbyte(tfs)
    - pos stream:  varbyte(per-doc position gaps, concatenated); per-doc
      position counts are the TFs, so no extra length stream is needed.
    """
    docs_bin = vb_encode(delta_encode(doc_ids, base))
    tfs_bin = vb_encode(np.asarray(tfs, dtype=np.uint64))
    if positions is None or len(positions) == 0:
        pos_bin = b""
    else:
        pos = np.asarray(positions, dtype=np.int64)
        tf = np.asarray(tfs, dtype=np.int64)
        # delta within each doc's run: subtract previous position, but at
        # each run start subtract 0 (positions are 1-based like the
        # reference; gap_0 = first position itself).
        gaps = np.diff(pos, prepend=np.int64(0))
        run_starts = np.cumsum(tf) - tf
        gaps[run_starts] = pos[run_starts]
        pos_bin = vb_encode(gaps.astype(np.uint64))
    return docs_bin, tfs_bin, pos_bin


def decode_posting_block(
    docs_bin: bytes,
    tfs_bin: bytes,
    pos_bin: bytes | None,
    base: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    doc_ids = delta_decode(vb_decode(docs_bin), base)
    tfs = vb_decode(tfs_bin).astype(np.int64)
    positions = None
    if pos_bin:
        gaps = vb_decode(pos_bin).astype(np.int64)
        # prefix-sum within runs: cumsum overall, then subtract the
        # cumulative sum at each run start (vectorized run-reset cumsum)
        run_starts = np.cumsum(tfs) - tfs
        cs = np.cumsum(gaps)
        offsets = np.zeros(gaps.size, dtype=np.int64)
        prior = np.where(run_starts > 0, cs[run_starts - 1], 0)
        offsets[run_starts] = np.diff(prior, prepend=np.int64(0))
        positions = cs - np.cumsum(offsets)
    return doc_ids, tfs, positions


def freq_stream_encode(doc_ids: np.ndarray, tfs: np.ndarray, base: int = 0) -> bytes:
    """Reference-parity interleaved freq stream.

    Per posting: VInt(docDelta<<1 | (tf==1)), then VInt(tf) iff tf>1
    (reference: AbstractSegmentWriter.php:371-380).
    """
    deltas = delta_encode(doc_ids, base)
    tf = np.asarray(tfs, dtype=np.uint64)
    first = (deltas << np.uint64(1)) | (tf == 1).astype(np.uint64)
    counts = np.where(tf > 1, 2, 1)
    starts = np.cumsum(counts) - counts
    out = np.zeros(int(counts.sum()), dtype=np.uint64)
    out[starts] = first
    multi = tf > 1
    out[starts[multi] + 1] = tf[multi]
    return vb_encode(out)


def freq_stream_decode(buf: bytes, base: int = 0) -> tuple[np.ndarray, np.ndarray]:
    vals = vb_decode(buf)
    doc_ids: list[int] = []
    tfs: list[int] = []
    i = 0
    prev = base
    n = vals.size
    # Interleaving makes head positions data-dependent; parity codec is
    # only used on small fixtures, so a scalar walk is acceptable here
    # (the production block format uses the vectorized separate streams).
    while i < n:
        head = int(vals[i])
        delta = head >> 1
        prev += delta
        doc_ids.append(prev)
        if head & 1:
            tfs.append(1)
            i += 1
        else:
            tfs.append(int(vals[i + 1]))
            i += 2
    return np.asarray(doc_ids, dtype=np.int64), np.asarray(tfs, dtype=np.int64)
