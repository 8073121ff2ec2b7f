"""Real media decode with the Python standard library + numpy: PNG
pixels and WAV PCM samples — no PIL/ffmpeg required.

This closes the half of the multimodal seam that pure stdlib CAN
close. ``ops.media_headers`` already byte-parses headers (dims, rates,
durations); this module decodes actual payloads:

- **PNG** (RFC 2083 / W3C PNG spec): signature → chunk walk →
  concatenated IDAT → ``zlib.inflate`` → per-scanline unfiltering
  (all five filter types: None/Sub/Up/Average/Paeth) → (H, W, C)
  array. The FULL storage matrix of the spec: bit depths 1/2/4/8
  (uint8 out, sub-8 gray rescaled ×255/(2**d−1)) and 16 (uint16 out),
  color types 0 (gray), 2 (RGB), 3 (indexed — PLTE lookup, tRNS
  alpha), 4 (gray+alpha), 6 (RGBA), gray/truecolor tRNS color keys,
  and both interlace methods (none + Adam7 7-pass).
- **WAV**: RIFF chunk walk to the ``data`` chunk, then a zero-copy
  ``np.frombuffer`` view — integer PCM 8/16/24/32, IEEE float 32/64,
  ITU-T G.711 A-law/µ-law (vectorized expansion tables), IMA/DVI
  ADPCM (vectorized across blocks, fact-chunk trimmed), and
  WAVE_FORMAT_EXTENSIBLE unwrapping → (n_samples, channels) int16.
  Remaining codec-bound formats (MS-ADPCM, MP3-in-WAV) raise
  ``UnsupportedMediaError`` (the Spark kernels map that to null rows,
  the same contract as an unrecognizable header).
- **encode_png** — the inverse direction, used by fixtures and tests:
  deterministic synthetic images round-trip through encode→decode,
  and hand-computed spec vectors (tests/test_media_decode.py) pin the
  decoder independently of the encoder so the pair can't cancel bugs.

Baseline JPEG decode is ALSO real — ``ops.jpeg`` implements the
ITU-T T.81 baseline codec (Huffman entropy decode + dequant + batched
IDCT) in pure numpy; :func:`decode_image_pixels` routes by signature.
``ops.gif`` decodes GIF87a/89a (LZW, palettes, interlace, multi-frame
compositing), and ``ops.mjpeg`` demuxes MJPEG tracks out of MP4
sample tables, so video FRAMES decode for real too when the track is
Motion-JPEG. Only compressed-codec frames (H.264/H.265/VP9/AV1)
remain behind ``NotImplementedError`` in
``ops.multimodal.decode_real`` — those genuinely need codec
libraries; routing, schema and batch flow are shared with the real
paths here, so a codec drop-in touches nothing upstream.

Unfiltering stays vectorized where the recurrence allows: Sub is an
exact per-lane ``cumsum`` mod 256, Up is one whole-row add, None is a
copy; Average and Paeth are sequential in x by definition (each pixel
needs the RECONSTRUCTED left neighbor) and loop over columns with
numpy ops across channels. Per-blob work is O(pixels); the Spark
entry points batch blobs through Arrow in ``mapInPandas`` so a 10^9
image corpus decodes as a single scan with no shuffle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from lucene_spark.ops.media_headers import PNG_SIG

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Well-formed media that this stdlib decoder intentionally does
    not cover (sub-8-bit/16-bit/interlaced PNG, compressed WAV)."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _png_chunks(blob: bytes):
    """Yield (tag, payload) over a PNG byte stream; stops at IEND."""
    pos = len(PNG_SIG)
    n = len(blob)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        start = pos + 8
        if start + length > n:
            raise ValueError("PNG chunk overruns the payload")
        yield tag, blob[start : start + length]
        pos = start + length + 4  # skip CRC
        if tag == b"IEND":
            return


def _unfilter(raw: np.ndarray, height: int, stride: int, fbpp: int) -> np.ndarray:
    """Invert PNG scanline filtering: raw = height rows of
    (1 filter byte + stride data bytes) → (height, stride) uint8.

    ``fbpp`` is the spec's filter delta, max(1, ceil(bits_per_pixel/8)):
    sub-8-bit rows filter byte-at-a-time (fbpp=1), 16-bit rows filter
    at 2 bytes per sample lane. ``stride`` is always a multiple of
    ``fbpp`` (for fbpp>1 the row is whole pixels; for fbpp=1 trivially)."""
    rows = raw.reshape(height, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    npix = stride // fbpp
    for y in range(height):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: rec[x] = row[x] + rec[x-fbpp]
            # per-lane prefix sum; mod distributes over addition
            rec = np.cumsum(row.reshape(npix, fbpp), axis=0) % 256
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(fbpp, dtype=np.int32)
            for x in range(npix):
                s = slice(x * fbpp, (x + 1) * fbpp)
                left = (row[s] + (left + prior[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(fbpp, dtype=np.int32)
            upleft = np.zeros(fbpp, dtype=np.int32)
            for x in range(npix):
                s = slice(x * fbpp, (x + 1) * fbpp)
                up = prior[s]
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, upleft),
                )
                left = (row[s] + pred) % 256
                rec[s] = left
                upleft = up
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


# valid bit depths per color type (W3C PNG spec §11.2.2, table 11.1)
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _scanline_stride(width: int, depth: int, channels: int) -> int:
    """Bytes per scanline (excluding the filter byte): packed bits
    round up to a whole byte per row (spec §7.2)."""
    return (width * depth * channels + 7) // 8


def _decode_rows(
    raw: np.ndarray, height: int, width: int, depth: int, channels: int
) -> np.ndarray:
    """Unfilter + unpack one (sub)image's raw scanlines →
    (height, width, channels) samples: uint8 for depth ≤ 8 (sub-8-bit
    values NOT yet rescaled — they stay in [0, 2**depth)), uint16 for
    depth 16. ``raw`` must be exactly height*(1+stride) bytes."""
    fbpp = max(1, depth * channels // 8)
    stride = _scanline_stride(width, depth, channels)
    rows = _unfilter(raw, height, stride, fbpp)  # (H, stride) uint8
    if depth == 8:
        return rows.reshape(height, width, channels)
    if depth == 16:
        a = np.ascontiguousarray(rows).view(">u2").astype(np.uint16)
        return a.reshape(height, width, channels)
    # depth 1/2/4: always 1 sample per pixel (gray or palette index)
    bits = np.unpackbits(rows, axis=1)[:, : width * depth]
    vals = bits.reshape(height, width, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.uint8)[:, :, None]


def decode_png(blob: bytes) -> np.ndarray:
    """Full PNG pixel decode → (height, width, channels) array.

    Covers the whole storage matrix of the spec: bit depths 1/2/4/8/16,
    color types 0 (gray), 2 (RGB), 3 (indexed), 4 (gray+alpha),
    6 (RGBA), interlace methods 0 (none) and 1 (Adam7). Indexed images
    resolve through PLTE — plus tRNS alpha when present — to (H, W, 3)
    or (H, W, 4); gray/truecolor tRNS color keys become an alpha
    channel. Sub-8-bit gray rescales to the full 0-255 range (spec
    §12.5 sample depth scaling: ×255/(2**depth−1), exact for 1/2/4).
    Returns uint8 for depth ≤ 8, uint16 for depth 16. Raises
    ``UnsupportedMediaError`` only for nonstandard interlace methods
    and ``ValueError`` for malformed bytes."""
    if not blob.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    depth = color_type = interlace = None
    channels = None
    palette = None
    trns_raw = None
    idat = []
    for tag, payload in _png_chunks(blob):
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if color_type not in _VALID_DEPTHS:
                raise ValueError(f"invalid PNG color type {color_type}")
            if depth not in _VALID_DEPTHS[color_type]:
                raise ValueError(
                    f"invalid PNG depth {depth} for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise UnsupportedMediaError(
                    f"nonstandard PNG interlace method {interlace}"
                )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            channels = 1 if color_type == 3 else _CHANNELS[color_type]
        elif tag == b"PLTE":
            if len(payload) % 3 or not payload:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns_raw = payload
        elif tag == b"IDAT":
            idat.append(payload)
    if width is None or channels is None:
        raise ValueError("PNG missing IHDR")
    if width == 0 or height == 0:
        raise ValueError("PNG with zero dimension")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        expect = height * (1 + _scanline_stride(width, depth, channels))
        if raw.size != expect:
            raise ValueError(
                f"PNG pixel data is {raw.size} bytes, expected {expect}"
            )
        px = _decode_rows(raw, height, width, depth, channels)
    else:  # Adam7: 7 independently-filtered sub-images, fixed grid
        px = np.zeros((height, width, channels), dtype=dtype)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            nbytes = hp * (1 + _scanline_stride(wp, depth, channels))
            if pos + nbytes > raw.size:
                raise ValueError("Adam7 pass overruns PNG pixel data")
            px[y0::dy, x0::dx] = _decode_rows(
                raw[pos : pos + nbytes], hp, wp, depth, channels
            )
            pos += nbytes
        if pos != raw.size:
            raise ValueError(
                f"PNG pixel data is {raw.size} bytes, Adam7 expects {pos}"
            )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max()) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]  # (H, W, 3)
        if trns_raw is None:
            return rgb
        trns = np.frombuffer(trns_raw, dtype=np.uint8)
        alpha = np.full(len(palette), 255, dtype=np.uint8)
        alpha[: min(len(trns), len(palette))] = trns[: len(palette)]
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=-1)
    # gray/truecolor tRNS: a single color key in SOURCE depth, 2 bytes
    # per sample (spec §11.3.2) — matching pixels become fully
    # transparent BEFORE sub-8 rescaling changes the sample values
    alpha_plane = None
    if trns_raw is not None and color_type in (0, 2):
        key = np.frombuffer(trns_raw, dtype=">u2").astype(px.dtype)
        if key.size != channels:
            raise ValueError("tRNS color key length mismatch")
        opaque = dtype(65535 if depth == 16 else 255)
        matches = (px == key.reshape(1, 1, channels)).all(axis=2)
        alpha_plane = np.where(matches, dtype(0), opaque)[:, :, None]
    if color_type == 0 and depth < 8:
        # exact spec §12.5 scaling: 255/(2**depth-1) is an integer
        px = px * np.uint8(255 // ((1 << depth) - 1))
    if alpha_plane is not None:
        return np.concatenate([px, alpha_plane], axis=-1)
    return px


def _filter_rows(px2d: np.ndarray, width: int, bpp: int, filters) -> bytes:
    """Forward PNG filtering (encoder side): (H, W*bpp) → raw stream."""
    height, stride = px2d.shape
    data = px2d.astype(np.int32)
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(filters[y % len(filters)])
        row = data[y]
        if f == 0:
            filt = row
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
            filt = (row - left) % 256
        elif f == 2:
            filt = (row - prior) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
            filt = (row - (left + prior) // 2) % 256
        elif f == 4:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])
            upleft = np.concatenate(
                [np.zeros(bpp, dtype=np.int32), prior[:-bpp]]
            )
            p = left + prior - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prior),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prior, upleft),
            )
            filt = (row - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
        prior = row
    return bytes(out)


def _encode_rows(samples: np.ndarray, depth: int, filters) -> bytes:
    """(H, W, C) samples → filtered raw scanline stream for one
    (sub)image: pack to scanline bytes (big-endian for 16, MSB-first
    bit packing below 8, zero row padding per spec §7.2), then apply
    the cycled per-row filters."""
    height, width, channels = samples.shape
    if depth == 16:
        b = (
            np.ascontiguousarray(samples.astype(">u2"))
            .view(np.uint8)
            .reshape(height, width * channels * 2)
        )
    elif depth == 8:
        b = samples.astype(np.uint8).reshape(height, width * channels)
    else:
        shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
        bits = (samples[:, :, 0, None].astype(np.uint8) >> shifts) & 1
        b = np.packbits(bits.reshape(height, width * depth), axis=1)
    fbpp = max(1, depth * channels // 8)
    return _filter_rows(b, width, fbpp, filters)


def encode_png(
    pixels: np.ndarray,
    filters=(0, 1, 2, 3, 4),
    depth: int = 8,
    interlace: int = 0,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
) -> bytes:
    """Encode samples → a complete valid PNG across the full storage
    matrix the decoder covers. ``filters`` is cycled per scanline
    (default exercises every filter type), letting fixtures and
    round-trip tests cover the whole unfilter matrix.

    - default: (H, W[, C]) uint8/uint16 direct color, ``depth`` 8/16.
    - ``palette``: (N, 3) uint8 entries; ``pixels`` are (H, W) indices,
      ``depth`` 1/2/4/8, optional ``trns`` alpha bytes.
    - ``depth`` < 8 without palette: grayscale, ``pixels`` are RAW
      samples in [0, 2**depth) (the decoder rescales to 0-255).
    - ``trns`` without palette: a gray/truecolor color key, one
      big-endian u16 per channel (source-depth sample values).
    - ``interlace=1``: Adam7 pass-split, each pass filtered alone."""
    if palette is not None:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"palette PNG depth {depth} invalid")
        color_type = 3
        idx = np.asarray(pixels)
        if idx.ndim == 3:
            idx = idx[:, :, 0]
        samples = idx.astype(np.uint16)[:, :, None]
        pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    else:
        px = np.asarray(pixels)
        if px.ndim == 2:
            px = px[:, :, None]
        if depth < 8:
            if px.shape[2] != 1:
                raise ValueError("sub-8-bit PNG is grayscale-only")
            color_type = 0
        else:
            color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(px.shape[2])
            if color_type is None:
                raise ValueError(f"unsupported channel count {px.shape[2]}")
        samples = px.astype(np.uint16)
    height, width, channels = samples.shape
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0, interlace
    )
    if interlace == 0:
        raw = _encode_rows(samples, depth, filters)
    elif interlace == 1:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_encode_rows(sub, depth, filters))
        raw = b"".join(parts)
    else:
        raise ValueError(f"unknown interlace method {interlace}")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    out = PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def _alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte → linear int16, the standard expansion
    (CCITT g711 reference algorithm), computed vectorized: XOR 0x55,
    4-bit mantissa, 3-bit segment, sign in bit 7 (set = positive)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    base = t + 0x108
    mag = np.where(
        seg == 0, t + 8, np.where(seg == 1, base, base << np.maximum(seg - 1, 0))
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def _ulaw_table() -> np.ndarray:
    """ITU-T G.711 µ-law byte → linear int16 (bias 0x84, complemented
    code word, sign in bit 7 of the complement = negative)."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


_ALAW = _alaw_table()
_ULAW = _ulaw_table()

# IMA/DVI ADPCM quantizer tables (IMA ADPCM reference algorithm)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_reconstruct(nib: np.ndarray, pred: np.ndarray, idx: np.ndarray):
    """One IMA ADPCM step for an ARRAY of independent decoder states:
    returns (new predictor, new step index). ``nib`` holds 4-bit codes;
    all three arrays share a shape (the vectorized-over-blocks axis)."""
    step = _IMA_STEPS[idx]
    diff = (
        (step >> 3)
        + np.where(nib & 1, step >> 2, 0)
        + np.where(nib & 2, step >> 1, 0)
        + np.where(nib & 4, step, 0)
    )
    pred = np.clip(
        pred + np.where(nib & 8, -diff, diff), -32768, 32767
    )
    idx = np.clip(idx + _IMA_INDEX_ADJ[nib & 7], 0, 88)
    return pred, idx


def decode_ima_adpcm(
    data: bytes, channels: int, block_align: int, samples_per_block: int
) -> np.ndarray:
    """IMA/DVI ADPCM payload → (n_samples, channels) int16.

    Each block carries a 4-byte header per channel (seed sample i16 +
    step index) followed by nibble words interleaved 4 bytes per
    channel, low nibble first. The recurrence is sequential WITHIN a
    block but blocks are independent decoder restarts, so the kernel
    vectorizes across (block, channel) states and loops only over the
    ≤ samples_per_block positions — the same parallel-axis shape the
    Spark kernels exploit (many blobs per Arrow batch)."""
    header_bytes = 4 * channels
    if block_align <= header_bytes or (block_align - header_bytes) % (
        4 * channels
    ):
        raise ValueError(f"ADPCM block align {block_align} invalid")
    nblocks = len(data) // block_align
    if nblocks == 0:
        return np.zeros((0, channels), dtype=np.int16)
    raw = np.frombuffer(
        data[: nblocks * block_align], dtype=np.uint8
    ).reshape(nblocks, block_align)
    header = raw[:, :header_bytes].reshape(nblocks, channels, 4)
    pred = header[:, :, 0].astype(np.int32) | (
        header[:, :, 1].astype(np.int32) << 8
    )
    pred -= (pred >> 15) << 16  # sign-extend the seed sample
    idx = header[:, :, 2].astype(np.int32)
    if int(idx.max()) > 88:
        raise ValueError("ADPCM step index out of range")
    # body bytes → per-channel nibble streams: 4-byte words alternate
    # channels; within a byte the LOW nibble is the earlier sample
    words = raw[:, header_bytes:].reshape(nblocks, -1, channels, 4)
    nib = np.stack([words & 0x0F, words >> 4], axis=-1).reshape(
        nblocks, -1, channels, 8
    )
    nib = nib.transpose(0, 2, 1, 3).reshape(nblocks, channels, -1)
    n_nib = min(nib.shape[2], samples_per_block - 1)
    out = np.empty((nblocks, channels, 1 + n_nib), dtype=np.int16)
    out[:, :, 0] = pred
    for t in range(n_nib):  # sequential by definition; vector over blocks
        pred, idx = _ima_reconstruct(nib[:, :, t].astype(np.int32), pred, idx)
        out[:, :, t + 1] = pred
    return out.transpose(0, 2, 1).reshape(-1, channels)


def encode_ima_adpcm_wav(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode (n, channels) int16 → a complete IMA ADPCM WAV (format
    tag 0x11 with the fact chunk) — the fixture/round-trip direction.
    The encoder is the textbook quantizer: per nibble it subtracts the
    running prediction, quantizes against the current step, then runs
    the SAME reconstruction as the decoder so their states stay in
    lockstep and the error per sample is bounded by the step size."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if n == 0:
        raise ValueError("cannot encode an empty signal")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block - 1 must be a multiple of 8")
    block_align = 4 * channels + (samples_per_block - 1) * channels // 2
    blocks = bytearray()
    idx = np.zeros(channels, dtype=np.int32)
    for start in range(0, n, samples_per_block):
        chunk = x[start : start + samples_per_block].astype(np.int32)
        if len(chunk) < samples_per_block:  # pad the tail block
            chunk = np.vstack(
                [chunk, np.repeat(chunk[-1:], samples_per_block - len(chunk), 0)]
            )
        pred = chunk[0].copy()
        for c in range(channels):
            blocks += struct.pack("<hBB", int(pred[c]), int(idx[c]), 0)
        nibs = np.empty((samples_per_block - 1, channels), dtype=np.uint8)
        for t in range(1, samples_per_block):
            step = _IMA_STEPS[idx]
            diff = chunk[t] - pred
            sign = (diff < 0).astype(np.int32) * 8
            mag = np.abs(diff)
            code = np.zeros(channels, dtype=np.int32)
            s = step.copy()
            for bit in (4, 2, 1):
                hit = mag >= s
                code |= np.where(hit, bit, 0)
                mag -= np.where(hit, s, 0)
                s >>= 1
            nib = (sign | code).astype(np.int32)
            pred, idx = _ima_reconstruct(nib, pred, idx)
            nibs[t - 1] = nib.astype(np.uint8)
        # pack per channel in 4-byte words, low nibble first
        per_ch = nibs.T.reshape(channels, -1, 8)  # (c, words, 8)
        lo = per_ch[:, :, 0::2]
        hi = per_ch[:, :, 1::2]
        packed = (lo | (hi << 4)).astype(np.uint8)  # (c, words, 4)
        blocks += packed.transpose(1, 0, 2).tobytes()  # alternate channels
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate, byte_rate, block_align, 4, 2,
        samples_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail (Data2..Data4 of the
# KSDATAFORMAT_SUBTYPE_* family); Data1's low u16 carries the real tag
_WAVE_EXT_GUID_TAIL = bytes.fromhex("000000000010800000aa00389b71")


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV decode → ((n_samples, channels) int16, sample_rate).

    Covers the common storage formats: integer PCM at 8 (unsigned,
    recentred), 16 (zero-copy view), 24 (sign-extended, top 16 bits
    kept) and 32 bits (top 16 bits kept); IEEE float 32/64 (format
    tag 3, clipped to ±1 then scaled); ITU-T G.711 A-law (tag 6) and
    µ-law (tag 7) via vectorized expansion tables; IMA/DVI ADPCM
    (tag 0x11, block-vectorized, trimmed to the fact-chunk sample
    count); and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE), which unwraps to
    any of the above through its SubFormat GUID. Everything converges
    on the int16 contract. Remaining codec-bound formats (MS-ADPCM,
    MP3-in-WAV) raise ``UnsupportedMediaError``."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    fact_samples = None
    n = len(blob)
    while pos + 8 <= n:
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        elif tag == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: tag in SubFormat
        if len(fmt) < 40:
            raise ValueError("extensible WAV fmt chunk too short")
        if fmt[26:40] != _WAVE_EXT_GUID_TAIL:
            raise UnsupportedMediaError("extensible WAV with vendor SubFormat")
        (audio_fmt,) = struct.unpack_from("<H", fmt, 24)
    if channels < 1:
        raise ValueError("WAV with zero channels")

    def trim(unit: int) -> bytes:
        frame = unit * channels
        return data[: len(data) - len(data) % frame]

    if audio_fmt == 1:  # integer PCM
        if bits == 16:
            flat = np.frombuffer(trim(2), dtype="<i2").astype(np.int16)
        elif bits == 8:
            flat = (
                np.frombuffer(trim(1), dtype=np.uint8).astype(np.int16) - 128
            ) * 256
        elif bits == 24:
            b = np.frombuffer(trim(3), dtype=np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v -= (v >> 23) << 24  # sign-extend bit 23
            flat = (v >> 8).astype(np.int16)
        elif bits == 32:
            flat = (
                np.frombuffer(trim(4), dtype="<i4") >> 16
            ).astype(np.int16)
        else:
            raise UnsupportedMediaError(
                f"WAV PCM bit depth {bits} (8/16/24/32)"
            )
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            f = np.frombuffer(trim(4), dtype="<f4").astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(trim(8), dtype="<f8").astype(np.float64)
        else:
            raise UnsupportedMediaError(f"WAV float bit depth {bits} (32/64)")
        flat = np.rint(np.clip(f, -1.0, 1.0) * 32767).astype(np.int16)
    elif audio_fmt == 6:  # G.711 A-law
        if bits != 8:
            raise UnsupportedMediaError(f"A-law WAV bit depth {bits} (8)")
        flat = _ALAW[np.frombuffer(trim(1), dtype=np.uint8)]
    elif audio_fmt == 7:  # G.711 µ-law
        if bits != 8:
            raise UnsupportedMediaError(f"µ-law WAV bit depth {bits} (8)")
        flat = _ULAW[np.frombuffer(trim(1), dtype=np.uint8)]
    elif audio_fmt == 0x11:  # IMA/DVI ADPCM
        (_, _, _, _, block_align, _) = struct.unpack_from("<HHIIHH", fmt, 0)
        if len(fmt) >= 20:
            (spb,) = struct.unpack_from("<H", fmt, 18)
        else:  # derive from the block geometry
            spb = (block_align - 4 * channels) * 2 // channels + 1
        frames = decode_ima_adpcm(data, channels, block_align, spb)
        if fact_samples is not None:
            frames = frames[:fact_samples]
        return frames, rate
    else:
        raise UnsupportedMediaError(
            f"WAV format tag {audio_fmt} (PCM/float/G.711/IMA-ADPCM only)"
        )
    return flat.reshape(-1, channels), rate


# ---------------------------------------------------------------------------
# Deterministic pixel/sample fixtures (tests + scale synthesis)
# ---------------------------------------------------------------------------

def fixture_pixels(i: int, max_side: int = 24) -> np.ndarray:
    """Deterministic (h, w, c) uint8 image for id ``i``: gradient +
    integer-hash texture, all integer math (platform-stable)."""
    h = 2 + i % max_side
    w = 2 + (i * 5) % max_side
    c = (1, 2, 3, 4)[i % 4]
    yy, xx, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    mix = (
        yy * 31
        + xx * 17
        + cc * 101
        + (yy * xx + 7) * (i * 2654435761 % 1024)
    )
    return ((mix * 2246822519 + 3266489917) % 251).astype(np.uint8)


def synth_png_pixels(i: int) -> bytes:
    """id → complete PNG CARRYING REAL PIXELS (fixture_pixels), filter
    types cycled per row — unlike media_headers.synth_png (header-only
    fixture with an empty IDAT)."""
    return encode_png(fixture_pixels(i))


def synth_jpeg_pixels(i: int) -> bytes:
    """id → complete baseline JPEG carrying real pixels: grayscale /
    RGB 4:4:4 / RGB 4:2:0 cycled by id, quality varied — exercises
    every decoder MCU shape."""
    from lucene_spark.ops.jpeg import encode_baseline_jpeg

    px = fixture_pixels(i)
    if px.shape[2] == 2:  # JPEG has no 2-channel mode; drop alpha
        px = px[:, :, :1]
    elif px.shape[2] == 4:
        px = px[:, :, :3]
    sub = "420" if (px.shape[2] == 3 and i % 2) else "444"
    return encode_baseline_jpeg(
        px, quality=(70, 85, 92, 100)[i % 4], subsampling=sub,
        restart_interval=(0, 3)[i % 2],
    )


def fixture_samples(i: int) -> tuple[np.ndarray, int]:
    """Deterministic ((n, ch) int16, rate) for id ``i`` — integer LCG
    samples, the same (rate, channels, n_samples) formulas as
    media_headers.fixture_audio."""
    from lucene_spark.ops.media_headers import fixture_audio

    rate, channels, n_samples = fixture_audio(i)
    t = np.arange(n_samples * channels, dtype=np.int64)
    vals = (t * 48271 + i * 2654435761) % 65536 - 32768
    return vals.astype(np.int16).reshape(n_samples, channels), rate


def synth_wav_pcm(i: int) -> bytes:
    """id → complete 16-bit PCM WAV carrying fixture_samples (real
    sample data, not the zeroed payload of media_headers.synth_wav)."""
    samples, rate = fixture_samples(i)
    n_samples, channels = samples.shape
    bits = 16
    block_align = channels * bits // 8
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# Spark entry points
# ---------------------------------------------------------------------------

_PIXEL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_std", DoubleType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)

_PCM_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
    ]
)


def decode_image_pixels(df: DataFrame) -> DataFrame:
    """(id, payload binary) → (id, width, height, channels, px_mean,
    px_std, px_min, px_max) by REAL pixel decode — PNG (stdlib zlib +
    numpy unfiltering), baseline JPEG (ops.jpeg, numpy Huffman+IDCT)
    or GIF (ops.gif, LZW + palette + compositing), routed by
    signature. Unrecognized / unsupported payloads yield null stats.
    Arrow-batched ``mapInPandas``, payload dropped on output — one
    scan, no shuffle, per-task memory bounded by the Arrow batch of
    blobs."""
    from lucene_spark.ops.gif import decode_gif
    from lucene_spark.ops.jpeg import decode_baseline_jpeg

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    raw = bytes(blob)
                    if raw[:2] == b"\xff\xd8":
                        px = decode_baseline_jpeg(raw)
                    elif raw[:6] in (b"GIF87a", b"GIF89a"):
                        px = decode_gif(raw)
                    else:
                        px = decode_png(raw)
                except (ValueError, zlib.error, struct.error, IndexError):
                    rows.append(
                        (int(i), None, None, None, None, None, None, None)
                    )
                    continue
                h, w, c = px.shape
                flat = px.astype(np.float64)
                rows.append(
                    (
                        int(i), w, h, c,
                        float(flat.mean()), float(flat.std()),
                        int(px.min()), int(px.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PIXEL_SCHEMA])

    return df.mapInPandas(kernel, _PIXEL_SCHEMA)


def decode_audio_pcm(df: DataFrame) -> DataFrame:
    """(id, payload binary) → (id, sample_rate, channels, n_samples,
    rms, peak) by REAL PCM decode of the WAV data chunk. Non-WAV /
    compressed payloads yield null stats."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    samples, rate = decode_wav(bytes(blob))
                except (ValueError, struct.error):
                    rows.append((int(i), None, None, None, None, None))
                    continue
                f = samples.astype(np.float64)
                rms = float(np.sqrt((f * f).mean())) if f.size else 0.0
                peak = int(np.abs(samples).max()) if samples.size else 0
                rows.append(
                    (int(i), rate, samples.shape[1], samples.shape[0], rms, peak)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PCM_SCHEMA])

    return df.mapInPandas(kernel, _PCM_SCHEMA)
