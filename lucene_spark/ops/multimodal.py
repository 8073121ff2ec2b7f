"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns
next to a typed metadata struct. The Spark-side plumbing here is real
and tested — schema, Arrow batch shape, ``mapInPandas`` partition
flow, deterministic feature extraction. Decode itself is REAL for PNG
pixels, WAV PCM samples, baseline JPEG pixels and MJPEG-MP4 video
frames (:func:`decode_real` → ops.media_decode / ops.jpeg /
ops.mjpeg, stdlib zlib/struct + numpy — the container has no media
libraries and doesn't need them for these formats); only
compressed-codec video frames (H.264/H.265/VP9/AV1) remain a
documented ``NotImplementedError`` seam, with ``decode_stub`` as the
deterministic test path.

At 100 TB the binary column dominates IO: keep it in its own parquet
column (column pruning skips it unless a decode stage runs) and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of blobs fits
executor memory; ``mapInPandas`` streams Arrow batches so a partition
never fully materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image|audio|video
        StructField("n_bytes", LongType()),
        StructField("sha_prefix", StringType()),   # first 16 hex of sha256
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha_prefix", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Test/bench helper: derive a deterministic opaque binary payload
    column (the utf-8 bytes of the text) + metadata struct, standing in
    for real media blobs. Pure Catalyst expressions."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.substring(F.sha2(payload, 256), 1, 16).alias("sha_prefix"),
        ).alias("meta"),
    )


def decode_stub(blob: bytes) -> np.ndarray:
    """Deterministic fake 'decode': FEATURE_DIM doubles in [0,1) from
    sha256(blob). Replace with a real decoder via :func:`decode_real`."""
    h = hashlib.sha256(blob).digest()
    ints = np.frombuffer(h[: FEATURE_DIM * 4], dtype=">u4").astype(np.float64)
    return ints / 2**32


def decode_real(blob: bytes, media_type: str) -> np.ndarray:
    """Real decode → FEATURE_DIM float64 feature vector.

    PNG, WAV, baseline JPEG, GIF and MJPEG-MP4 payloads are ACTUALLY
    decoded (ops.media_decode / ops.jpeg / ops.gif / ops.mjpeg —
    stdlib zlib/struct + numpy, no media libraries): PNG/JPEG →
    [width, height, channels, pixel mean, pixel std, min, max,
    n_bytes]; WAV → [sample_rate, channels, n_samples, rms, peak,
    duration_ms, 0, n_bytes]; GIF and MJPEG MP4 (frame sequences) →
    [width, height, channels, frame-0 mean, frame-0 std, n_frames, 0,
    n_bytes]. Only compressed-codec video frames (H.264/H.265/VP9/AV1)
    still raise ``NotImplementedError`` — those genuinely require
    codec libraries absent from this container; a codec drop-in slots
    into the same routing without touching the pipeline.
    """
    from lucene_spark.ops.media_decode import decode_png, decode_wav

    if blob.startswith(b"\x89PNG\r\n\x1a\n"):
        px = decode_png(blob)
        h, w, c = px.shape
        f = px.astype(np.float64)
        return np.array(
            [w, h, c, f.mean(), f.std(), px.min(), px.max(), len(blob)],
            dtype=np.float64,
        )
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        samples, rate = decode_wav(blob)
        f = samples.astype(np.float64)
        rms = float(np.sqrt((f * f).mean())) if f.size else 0.0
        peak = int(np.abs(samples).max()) if samples.size else 0
        n = samples.shape[0]
        return np.array(
            [rate, samples.shape[1], n, rms, peak, n * 1000 // rate, 0.0,
             len(blob)],
            dtype=np.float64,
        )
    if blob[:2] == b"\xff\xd8":
        from lucene_spark.ops.jpeg import decode_baseline_jpeg

        px = decode_baseline_jpeg(blob)
        h, w, c = px.shape
        f = px.astype(np.float64)
        return np.array(
            [w, h, c, f.mean(), f.std(), px.min(), px.max(), len(blob)],
            dtype=np.float64,
        )
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from lucene_spark.ops.gif import decode_gif, gif_frame_count

        px = decode_gif(blob)
        h, w, c = px.shape
        f = px.astype(np.float64)
        return np.array(
            [w, h, c, f.mean(), f.std(), gif_frame_count(blob), 0.0,
             len(blob)],
            dtype=np.float64,
        )
    if blob[4:8] == b"ftyp":
        from lucene_spark.ops.jpeg import decode_baseline_jpeg
        from lucene_spark.ops.mjpeg import demux_mjpeg_frames

        try:
            frames = demux_mjpeg_frames(blob)
        except ValueError as exc:  # incl. UnsupportedMediaError: codec gap
            raise NotImplementedError(
                f"video: {exc}; only MJPEG tracks decode without codec "
                "libraries (ops.mjpeg)"
            ) from exc
        px = decode_baseline_jpeg(frames[0])
        h, w, c = px.shape
        f = px.astype(np.float64)
        return np.array(
            [w, h, c, f.mean(), f.std(), len(frames), 0.0, len(blob)],
            dtype=np.float64,
        )
    raise NotImplementedError(
        f"{media_type}: unrecognized payload; PNG/WAV/baseline-JPEG/"
        "GIF/MJPEG-MP4 decode is real (ops.media_decode, ops.jpeg, "
        "ops.gif, ops.mjpeg), decode_stub remains the deterministic "
        "fallback for codec-bound formats (H.264/H.265/VP9/AV1 frames)"
    )


_DIMS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
    ]
)


def attach_synthetic_media(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic byte-VALID media fixtures: id → complete PNG
    (even ids) / JPEG (odd ids) whose dimensions are a pure function of
    the id (ops.media_headers.fixture_dims) — so an oracle can verify
    the real byte-parse end-to-end without any image library. Arrow
    batches via mapInPandas; one payload per row."""
    from lucene_spark.ops.media_headers import synth_media

    out_schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"id": ids.to_numpy(), "payload": [synth_media(int(i)) for i in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(kernel, out_schema)


def extract_image_dims(df: DataFrame) -> DataFrame:
    """(id, payload binary) → (id, format, width, height, channels) by
    REAL byte parsing of PNG IHDR / JPEG SOFn headers
    (ops.media_headers — stdlib-only, no image libraries). Rows whose
    payload is not a recognizable PNG/JPEG yield null format/dims.
    Same Arrow/mapInPandas shape as :func:`extract_features`; the
    payload column is dropped on output so downstream stages never
    re-read the heavy bytes."""
    from lucene_spark.ops.media_headers import parse_image_header

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                parsed = parse_image_header(bytes(blob)) if blob is not None else None
                if parsed is None:
                    rows.append((int(i), None, None, None, None))
                else:
                    fmt, w, h, c = parsed
                    rows.append((int(i), fmt, w, h, c))
            yield pd.DataFrame(
                rows, columns=["id", "format", "width", "height", "channels"]
            )

    return df.mapInPandas(kernel, _DIMS_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("format", StringType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("bits", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

_VIDEO_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("format", StringType()),
        StructField("timescale", LongType()),
        StructField("duration_units", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_synthetic_audio(df: DataFrame, id_col: str = "id") -> DataFrame:
    """id → complete byte-valid 16-bit PCM WAV whose rate/channels/
    sample count are a pure function of the id
    (ops.media_headers.fixture_audio) — oracle-verifiable end-to-end."""
    from lucene_spark.ops.media_headers import synth_wav

    out_schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"id": ids.to_numpy(), "payload": [synth_wav(int(i)) for i in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(kernel, out_schema)


def attach_synthetic_video(df: DataFrame, id_col: str = "id") -> DataFrame:
    """id → minimal byte-valid MP4 (ftyp + moov/mvhd) whose timescale/
    duration are a pure function of the id
    (ops.media_headers.fixture_video)."""
    from lucene_spark.ops.media_headers import synth_mp4

    out_schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"id": ids.to_numpy(), "payload": [synth_mp4(int(i)) for i in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(kernel, out_schema)


def extract_audio_meta(df: DataFrame) -> DataFrame:
    """(id, payload binary) → (id, format, channels, sample_rate, bits,
    n_samples, duration_ms) by REAL RIFF/WAV chunk-walk parsing
    (ops.media_headers.parse_wav_header — stdlib only). duration_ms is
    integer floor(n_samples·1000/rate) so a SQL oracle reproduces it
    exactly. Unrecognized payloads yield null metadata; the payload
    column is dropped on output."""
    from lucene_spark.ops.media_headers import parse_wav_header

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                parsed = parse_wav_header(bytes(blob)) if blob is not None else None
                if parsed is None:
                    rows.append((int(i), None, None, None, None, None, None))
                else:
                    ch, rate, bits, ns = parsed
                    rows.append(
                        (int(i), "wav", ch, rate, bits, ns, ns * 1000 // rate)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "format", "channels", "sample_rate", "bits",
                    "n_samples", "duration_ms",
                ],
            )

    return df.mapInPandas(kernel, _AUDIO_SCHEMA)


def extract_video_meta(df: DataFrame) -> DataFrame:
    """(id, payload binary) → (id, format, timescale, duration_units,
    duration_ms) by REAL ISO-BMFF box-walk parsing of moov/mvhd
    (ops.media_headers.parse_mp4_header — stdlib only)."""
    from lucene_spark.ops.media_headers import parse_mp4_header

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for i, blob in zip(pdf["id"], pdf["payload"]):
                parsed = parse_mp4_header(bytes(blob)) if blob is not None else None
                if parsed is None:
                    rows.append((int(i), None, None, None, None))
                else:
                    ts, dur = parsed
                    rows.append((int(i), "mp4", ts, dur, dur * 1000 // ts))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "format", "timescale", "duration_units", "duration_ms",
                ],
            )

    return df.mapInPandas(kernel, _VIDEO_SCHEMA)


def plan_resize(dims_df: DataFrame, max_side: int = 256) -> DataFrame:
    """(id, width, height) → (id, width, height, out_width, out_height,
    scaled): aspect-preserving downscale plan with the long side capped
    at ``max_side`` (never upscales; floor division, min 1 px).

    Pure Catalyst integer math over the *metadata* table — the resize
    plan for 10^9 images is computed without touching a single payload
    byte (column pruning drops the binary column). The actual pixel
    resample belongs in :func:`decode_real`'s seam; this stage decides
    the target geometry so the decode stage is a single pass.
    Integer-exact, so a SQL oracle reproduces it bit-for-bit.
    """
    if max_side < 1:
        raise ValueError(f"max_side must be >= 1 (got {max_side})")
    m = int(max_side)
    big = F.greatest(F.col("width"), F.col("height")).cast("long")
    fit = big <= F.lit(m)

    def scale(side: str):
        # integer floor division (Spark `div` ≡ the oracle's `//`)
        scaled = F.expr(
            f"CAST({side} AS BIGINT) * {m} div "
            f"greatest(CAST(width AS BIGINT), CAST(height AS BIGINT))"
        )
        return F.when(fit, F.col(side).cast("long")).otherwise(
            F.greatest(F.lit(1).cast("long"), scaled)
        )

    return dims_df.select(
        "id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        scale("width").alias("out_width"),
        scale("height").alias("out_height"),
        (~fit).alias("scaled"),
    )


def plan_frame_samples(video_meta_df: DataFrame, n_frames: int = 8) -> DataFrame:
    """(id, duration_ms) → (id, frame_idx, ts_ms): ``n_frames`` uniform
    sample timestamps per video, ts_ms[i] = floor(duration_ms·i/n).

    Pure Catalyst (sequence + explode) over the metadata table — the
    frame-sampling plan is decided columnar-side and only then joined
    back to payloads, so the (heavy) decode stage receives an explicit
    work list instead of re-deriving it per blob. Integer-exact for the
    SQL oracle; the frame *extraction* itself is the
    :func:`decode_real` seam.
    """
    if n_frames < 1:
        raise ValueError(f"n_frames must be >= 1 (got {n_frames})")
    n = int(n_frames)
    return video_meta_df.select(
        "id",
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("frame_idx"),
    ).select(
        "id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.expr(f"(CAST(duration_ms AS BIGINT) * frame_idx) div {n}").alias("ts_ms"),
    )


def extract_features(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """(id, payload binary, meta struct) → (id, meta.*, feature).

    Arrow-batched mapInPandas: each batch's blobs are decoded in one
    pass — the only per-item Python, exactly where decode belongs.
    Output drops the payload column so downstream stages never re-read
    the heavy bytes.

    ``decoder``: ``"stub"`` (default — deterministic sha256 features,
    SQL-oracle-able) or ``"real"`` — route through
    :func:`decode_real`: PNG/baseline-JPEG pixels, WAV PCM and
    MJPEG-MP4 frames are actually decoded (ops.media_decode, ops.jpeg,
    ops.mjpeg); codec-bound payloads (compressed video / unknown)
    yield a null feature, the same null contract as the header parsers.
    """
    if decoder not in ("stub", "real"):
        raise ValueError(f"decoder must be 'stub' or 'real' (got {decoder!r})")

    def _feat(blob, media_type):
        if decoder == "stub":
            return decode_stub(blob).tolist()
        import struct
        import zlib

        try:
            return decode_real(bytes(blob), media_type).tolist()
        except (NotImplementedError, ValueError, zlib.error, struct.error,
                IndexError):
            return None

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            meta = pd.DataFrame(list(pdf["meta"]))
            feats = [
                _feat(b, t)
                for b, t in zip(pdf["payload"], meta["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "media_type": meta["media_type"].to_numpy(),
                    "n_bytes": meta["n_bytes"].to_numpy(),
                    "sha_prefix": meta["sha_prefix"].to_numpy(),
                    "feature": feats,
                }
            )

    return df.mapInPandas(kernel, _FEATURES_SCHEMA)
