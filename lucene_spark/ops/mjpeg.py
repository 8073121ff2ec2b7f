"""Motion-JPEG in MP4: real video-frame decode with no codec libraries.

MP4 (ISO-BMFF, the public ISO/IEC 14496-12 spec) is a CONTAINER — the
sample tables (`stsz`/`stco`/`stsc`) locate each video frame's bytes,
and when the track's sample entry is `jpeg`/`mjpa` (Motion-JPEG), every
frame is a complete baseline JPEG that ``ops.jpeg`` decodes for real.
This closes the video half of the multimodal seam for MJPEG tracks;
inter-frame codecs (H.264/H.265/VP9/AV1) genuinely need codec
libraries and remain the one documented ``UnsupportedMediaError``.

- :func:`demux_mjpeg_frames` — box walk (``moov/trak/mdia/minf/stbl``),
  full `stsc` chunk-map expansion, `stsz`/`stco`(+`co64`) sample
  ranges → per-frame JPEG bytes. Rejects non-MJPEG sample entries
  explicitly (that's a codec gap, not a parse failure).
- :func:`decode_mjpeg_mp4` — demux + ``decode_baseline_jpeg`` per
  frame, optionally a uniform k-of-n frame subset — the SAME uniform
  rule as ``ops.multimodal.plan_frame_samples`` (frame j of k samples
  sample index ``n*j // k``), so the metadata-only planner and the
  real decoder pick the same frames.
- :func:`encode_mjpeg_mp4` — the fixture-direction muxer: ftyp + mdat
  (concatenated JPEGs) + moov with a spec-shaped sample table (mvhd
  carries timescale/duration so ``media_headers.parse_mp4_header``
  reads the same fields it reads on real files).
- :func:`decode_video_frames` — the Spark op: one Arrow-batched
  ``mapInPandas`` scan → (id, frame_idx, width, height, channels,
  px_mean, px_std); no shuffle, memory bounded by the Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from lucene_spark.ops.jpeg import decode_baseline_jpeg, encode_baseline_jpeg
from lucene_spark.ops.media_decode import UnsupportedMediaError

_MJPEG_FORMATS = (b"jpeg", b"mjpa", b"mjpb")


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + tag + payload


def _full_box(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version) + struct.pack(">I", flags)[1:] + payload)


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [start, end)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", data[i: i + 4])[0]
        tag = data[i + 4: i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", data[i + 8: i + 16])[0]
            body = i + 16
        if size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("malformed ISO-BMFF box")
        yield tag, body, i + size
        i += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """Descend a box path; returns (body_start, body_end) or None."""
    tag0 = path[0]
    for tag, b, e in _walk_boxes(data, start, end):
        if tag == tag0:
            if len(path) == 1:
                return b, e
            got = _find_box(data, b, e, path[1:])
            if got is not None:
                return got
    return None


def demux_mjpeg_frames(blob: bytes) -> list[bytes]:
    """Extract each MJPEG video frame's JPEG bytes from an MP4.

    Walks moov → every trak; uses the first track whose ``stsd`` sample
    entry is an MJPEG format. A video track with any other (compressed)
    codec raises ``UnsupportedMediaError``.
    """
    moov = _find_box(blob, 0, len(blob), [b"moov"])
    if moov is None:
        raise ValueError("no moov box")
    codec_seen = None
    for tag, b, e in _walk_boxes(blob, moov[0], moov[1]):
        if tag != b"trak":
            continue
        stbl = _find_box(blob, b, e, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            continue
        stsd = _find_box(blob, stbl[0], stbl[1], [b"stsd"])
        if stsd is None:
            continue
        # stsd: version/flags (4) + entry_count (4) + entries
        fmt = None
        for etag, _eb, _ee in _walk_boxes(blob, stsd[0] + 8, stsd[1]):
            fmt = etag
            break
        if fmt not in _MJPEG_FORMATS:
            codec_seen = fmt
            continue
        return _sample_ranges(blob, stbl[0], stbl[1])
    if codec_seen is not None:
        raise UnsupportedMediaError(
            f"video codec {codec_seen!r} needs codec libraries; only "
            "MJPEG tracks decode without them"
        )
    raise ValueError("no video sample table found")


def _sample_ranges(blob: bytes, stbl_b: int, stbl_e: int) -> list[bytes]:
    stsz = _find_box(blob, stbl_b, stbl_e, [b"stsz"])
    stco = _find_box(blob, stbl_b, stbl_e, [b"stco"])
    co64 = _find_box(blob, stbl_b, stbl_e, [b"co64"])
    stsc = _find_box(blob, stbl_b, stbl_e, [b"stsc"])
    if stsz is None or (stco is None and co64 is None) or stsc is None:
        raise ValueError("incomplete sample table")
    # stsz: ver/flags, sample_size, sample_count[, sizes]
    const_size, n_samples = struct.unpack(">II", blob[stsz[0] + 4: stsz[0] + 12])
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(
            struct.unpack(f">{n_samples}I", blob[stsz[0] + 12: stsz[0] + 12 + 4 * n_samples])
        )
    if stco is not None:
        n_chunks = struct.unpack(">I", blob[stco[0] + 4: stco[0] + 8])[0]
        offsets = struct.unpack(
            f">{n_chunks}I", blob[stco[0] + 8: stco[0] + 8 + 4 * n_chunks]
        )
    else:
        n_chunks = struct.unpack(">I", blob[co64[0] + 4: co64[0] + 8])[0]
        offsets = struct.unpack(
            f">{n_chunks}Q", blob[co64[0] + 8: co64[0] + 8 + 8 * n_chunks]
        )
    # stsc: (first_chunk, samples_per_chunk, desc_idx) runs → per-chunk counts
    n_ent = struct.unpack(">I", blob[stsc[0] + 4: stsc[0] + 8])[0]
    ents = [
        struct.unpack(">III", blob[stsc[0] + 8 + 12 * k: stsc[0] + 20 + 12 * k])
        for k in range(n_ent)
    ]
    per_chunk: list[int] = []
    for k, (first, spc, _d) in enumerate(ents):
        last = ents[k + 1][0] - 1 if k + 1 < n_ent else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    frames: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            frames.append(blob[pos: pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("sample table inconsistent with chunk map")
    return frames


def uniform_frame_indices(n_samples: int, k: int) -> list[int]:
    """Uniform k-of-n rule shared with plan_frame_samples: sample
    ``n*j // k`` for j in 0..k-1 (all frames if k >= n or k <= 0)."""
    if k <= 0 or k >= n_samples:
        return list(range(n_samples))
    return [n_samples * j // k for j in range(k)]


def decode_mjpeg_mp4(blob: bytes, n_frames: int = 0) -> list[tuple[int, np.ndarray]]:
    """MP4 bytes → [(sample_idx, (H, W, C) uint8), ...]; ``n_frames``
    selects a uniform subset (0 = decode every frame)."""
    frames = demux_mjpeg_frames(blob)
    idxs = uniform_frame_indices(len(frames), n_frames)
    return [(i, decode_baseline_jpeg(frames[i])) for i in idxs]


def encode_mjpeg_mp4(
    jpeg_frames: list[bytes],
    timescale: int = 600,
    frame_duration: int = 20,
) -> bytes:
    """Mux complete JPEG blobs into a minimal MJPEG MP4 (one video
    track, one chunk). The first frame's SOF dims fill tkhd/stsd."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    from lucene_spark.ops.media_headers import parse_jpeg_header

    dims = parse_jpeg_header(jpeg_frames[0])
    if dims is None:
        raise ValueError("frame 0 is not a parseable JPEG")
    width, height, _ = dims
    n = len(jpeg_frames)
    duration = n * frame_duration

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(jpeg_frames)
    mdat = _box(b"mdat", mdat_payload)
    first_off = len(ftyp) + 8  # mdat body starts after its 8-byte header

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 7,
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + b"\x00" * 4        # track id + reserved
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)           # layer/group/volume/rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">II", 0, 0) + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),             # language 'und'
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"MJPEG\x00",
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)           # reserved + data_ref_idx
        + b"\x00" * 16                                # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)          # reserved + frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1)                  # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, frame_duration))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames),
    )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _full_box(b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")))
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------- deterministic fixtures


def fixture_frame_pixels(i: int, frame: int, max_side: int = 24) -> np.ndarray:
    """Per-(video, frame) uint8 image; dims are constant across a
    video's frames (an MJPEG track has one size), content varies."""
    from lucene_spark.ops.media_decode import fixture_pixels

    base = fixture_pixels(i, max_side)
    if base.shape[2] in (2, 4):  # JPEG channel counts only
        base = base[:, :, : base.shape[2] - 1]
    return ((base.astype(np.int64) + frame * 37) % 251).astype(np.uint8)


def fixture_n_frames(i: int) -> int:
    return 2 + i % 5


def synth_mjpeg_mp4(i: int) -> bytes:
    """id → complete MJPEG MP4 with fixture_n_frames(i) real JPEG
    frames (quality 100 so frame stats are near-exact), timescale from
    media_headers.fixture_video for cross-module consistency."""
    from lucene_spark.ops.media_headers import fixture_video

    ts, _ = fixture_video(i)
    frames = [
        encode_baseline_jpeg(fixture_frame_pixels(i, j), quality=100)
        for j in range(fixture_n_frames(i))
    ]
    return encode_mjpeg_mp4(frames, timescale=ts, frame_duration=ts // 10 or 1)


# ------------------------------------------------------------ Spark op

_FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_std", DoubleType()),
    ]
)


def decode_video_frames(df: DataFrame, n_frames: int = 0) -> DataFrame:
    """(id, payload binary) → one row per decoded frame with REAL pixel
    stats, for MJPEG MP4 payloads. ``n_frames`` > 0 decodes only the
    uniform subset plan_frame_samples would pick. Non-MJPEG /
    malformed payloads yield a single null row per id (the shared null
    contract). One Arrow-batched scan, no shuffle."""

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                try:
                    decoded = decode_mjpeg_mp4(bytes(blob), n_frames)
                except (ValueError, struct.error, IndexError):
                    rows.append((int(i), None, None, None, None, None, None))
                    continue
                for fi, px in decoded:
                    h, w, c = px.shape
                    f = px.astype(np.float64)
                    rows.append(
                        (int(i), fi, w, h, c, float(f.mean()), float(f.std()))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA])

    return df.mapInPandas(kernel, _FRAME_SCHEMA)
