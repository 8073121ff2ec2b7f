"""Real media decode with the Python standard library + numpy: PNG
pixels and WAV PCM samples — no PIL/ffmpeg required.

This closes the half of the multimodal seam that pure stdlib CAN
close. ``ops.media_headers`` already byte-parses headers (dims, rates,
durations); this module decodes actual payloads:

- **PNG** (RFC 2083 / W3C PNG spec): signature → chunk walk →
  concatenated IDAT → ``zlib.inflate`` → per-scanline unfiltering
  (all five filter types: None/Sub/Up/Average/Paeth) → (H, W, C)
  uint8 array. Supports bit depth 8, color types 0 (gray), 2 (RGB),
  3 (indexed — PLTE lookup, tRNS alpha) 4 (gray+alpha), 6 (RGBA),
  non-interlaced — the overwhelmingly common storage shapes. Sub-8-bit
  depths, 16-bit and Adam7 raise ``UnsupportedMediaError`` (the Spark
  kernels map that to null rows, the same contract as an
  unrecognizable header).
- **WAV**: RIFF chunk walk to the ``data`` chunk, then a zero-copy
  ``np.frombuffer`` view — PCM16 (int16) and PCM8 (uint8, recentred
  to int16) → (n_samples, channels) int16.
- **encode_png** — the inverse direction, used by fixtures and tests:
  deterministic synthetic images round-trip through encode→decode,
  and hand-computed spec vectors (tests/test_media_decode.py) pin the
  decoder independently of the encoder so the pair can't cancel bugs.

Baseline JPEG decode is ALSO real — ``ops.jpeg`` implements the
ITU-T T.81 baseline codec (Huffman entropy decode + dequant + batched
IDCT) in pure numpy; :func:`decode_image_pixels` routes by signature.
And ``ops.mjpeg`` demuxes MJPEG tracks out of MP4 sample tables, so
video FRAMES decode for real too when the track is Motion-JPEG. Only
compressed-codec frames (H.264/H.265/VP9/AV1) remain behind
``NotImplementedError`` in ``ops.multimodal.decode_real`` — those
genuinely need codec libraries; routing, schema and batch flow are
shared with the real paths here, so a codec drop-in touches nothing
upstream.

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


def _unfilter(raw: np.ndarray, height: int, width: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering: raw = height rows of
    (1 filter byte + width*bpp data bytes) → (height, width*bpp) uint8."""
    stride = width * bpp
    rows = raw.reshape(height, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: rec[x] = row[x] + rec[x-bpp]
            # per-lane prefix sum; mod distributes over addition
            rec = np.cumsum(row.reshape(width, bpp), axis=0) % 256
            rec = rec.reshape(stride)
        elif f == 2:  # Up
            rec = (row + prior) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(width):
                s = slice(x * bpp, (x + 1) * bpp)
                left = (row[s] + (left + prior[s]) // 2) % 256
                rec[s] = left
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(width):
                s = slice(x * bpp, (x + 1) * bpp)
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


def decode_png(blob: bytes) -> np.ndarray:
    """Full PNG pixel decode → (height, width, channels) uint8.

    Bit depth 8, color types 0/2/3/4/6, non-interlaced. Indexed
    (palette) images resolve through PLTE — plus tRNS alpha when
    present — to (H, W, 3) or (H, W, 4). Raises
    ``UnsupportedMediaError`` for valid-but-uncovered PNGs (sub-8-bit
    or 16-bit depth, Adam7) and ``ValueError`` for malformed bytes."""
    if not blob.startswith(PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bpp = None
    color_type = None
    palette = trns = None
    idat = []
    for tag, payload in _png_chunks(blob):
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if depth != 8:
                raise UnsupportedMediaError(f"PNG bit depth {depth} (only 8)")
            if color_type != 3 and color_type not in _CHANNELS:
                raise UnsupportedMediaError(f"PNG color type {color_type}")
            if interlace != 0:
                raise UnsupportedMediaError("interlaced PNG (Adam7)")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            bpp = 1 if color_type == 3 else _CHANNELS[color_type]
        elif tag == b"PLTE":
            if len(payload) % 3 or not payload:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
    if width is None or bpp is None:
        raise ValueError("PNG missing IHDR")
    if width == 0 or height == 0:
        raise ValueError("PNG with zero dimension")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    expect = height * (1 + width * bpp)
    if raw.size != expect:
        raise ValueError(
            f"PNG pixel data is {raw.size} bytes, expected {expect}"
        )
    px = _unfilter(raw, height, width, bpp).reshape(height, width, bpp)
    if color_type != 3:
        return px
    if palette is None:
        raise ValueError("palette PNG missing PLTE")
    idx = px[:, :, 0]
    if int(idx.max()) >= len(palette):
        raise ValueError("palette index out of range")
    rgb = palette[idx]  # (H, W, 3)
    if trns is None:
        return rgb
    alpha = np.full(len(palette), 255, dtype=np.uint8)
    alpha[: min(len(trns), len(palette))] = trns[: len(palette)]
    return np.concatenate([rgb, alpha[idx][:, :, None]], axis=-1)


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


def encode_png(pixels: np.ndarray, filters=(0, 1, 2, 3, 4)) -> bytes:
    """Encode (H, W, C) uint8 → a complete valid PNG. ``filters`` is
    cycled per scanline (default exercises every filter type), letting
    fixtures and round-trip tests cover the whole unfilter matrix."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    height, width, bpp = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(bpp)
    if color_type is None:
        raise ValueError(f"unsupported channel count {bpp}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = _filter_rows(px.reshape(height, width * bpp), width, bpp, filters)

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode → ((n_samples, channels) int16, sample_rate).

    16-bit PCM is viewed zero-copy; 8-bit PCM (unsigned per the spec)
    is recentred to int16. Compressed formats raise
    ``UnsupportedMediaError``."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(blob)
    while pos + 8 <= n:
        tag = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1:
        raise UnsupportedMediaError(f"WAV format tag {audio_fmt} (only PCM)")
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        flat = np.frombuffer(
            data[: len(data) - len(data) % (2 * channels)], dtype="<i2"
        ).astype(np.int16)
    elif bits == 8:
        flat = (
            np.frombuffer(
                data[: len(data) - len(data) % channels], dtype=np.uint8
            ).astype(np.int16)
            - 128
        ) * 256
    else:
        raise UnsupportedMediaError(f"WAV bit depth {bits} (only 8/16 PCM)")
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
    numpy unfiltering) or baseline JPEG (ops.jpeg, numpy Huffman+IDCT),
    routed by signature. Unrecognized / unsupported payloads yield
    null stats. Arrow-batched ``mapInPandas``, payload dropped on
    output — one scan, no shuffle, per-task memory bounded by the
    Arrow batch of blobs."""
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
