"""MJPEG-in-MP4: mux/demux round-trips, codec rejection, Spark op."""

import struct

import numpy as np
import pytest

from lucene_spark.ops import mjpeg as M
from lucene_spark.ops.jpeg import decode_baseline_jpeg, encode_baseline_jpeg
from lucene_spark.ops.media_decode import UnsupportedMediaError


def _frames(i, n=4):
    return [
        encode_baseline_jpeg(M.fixture_frame_pixels(i, j), quality=100)
        for j in range(n)
    ]


def test_mux_demux_byte_exact():
    frames = _frames(5, 4)
    blob = M.encode_mjpeg_mp4(frames, timescale=600, frame_duration=25)
    back = M.demux_mjpeg_frames(blob)
    assert back == frames  # exact byte ranges, not re-encoded


def test_decoded_frames_match_driver_decode():
    frames = _frames(2, 3)
    blob = M.encode_mjpeg_mp4(frames)
    out = M.decode_mjpeg_mp4(blob)
    assert [i for i, _ in out] == [0, 1, 2]
    for (_, px), f in zip(out, frames):
        assert (px == decode_baseline_jpeg(f)).all()


def test_frame_content_actually_varies():
    blob = M.synth_mjpeg_mp4(7)
    out = M.decode_mjpeg_mp4(blob)
    assert len(out) == M.fixture_n_frames(7)
    means = [px.astype(float).mean() for _, px in out]
    assert len(set(round(m, 6) for m in means)) > 1


def test_uniform_subset_matches_plan_rule():
    assert M.uniform_frame_indices(10, 4) == [0, 2, 5, 7]
    assert M.uniform_frame_indices(3, 8) == [0, 1, 2]  # k >= n: all
    assert M.uniform_frame_indices(5, 0) == [0, 1, 2, 3, 4]
    frames = _frames(1, 6)
    blob = M.encode_mjpeg_mp4(frames)
    out = M.decode_mjpeg_mp4(blob, n_frames=2)
    assert [i for i, _ in out] == [0, 3]


def test_mp4_header_parser_reads_muxed_file():
    from lucene_spark.ops.media_headers import fixture_video, parse_mp4_header

    i = 9
    blob = M.synth_mjpeg_mp4(i)
    ts, _ = fixture_video(i)
    got = parse_mp4_header(blob)
    assert got is not None and got[0] == ts


def test_compressed_codec_rejected_as_codec_gap():
    frames = _frames(0, 2)
    blob = bytearray(M.encode_mjpeg_mp4(frames))
    at = blob.index(b"stsd")
    fmt = bytes(blob).index(b"jpeg", at)  # the sample-entry format tag
    blob[fmt: fmt + 4] = b"avc1"
    with pytest.raises(UnsupportedMediaError):
        M.demux_mjpeg_frames(bytes(blob))


def test_malformed_rejected():
    with pytest.raises(ValueError):
        M.demux_mjpeg_frames(b"\x00\x00\x00\x08ftyp")  # no moov
    frames = _frames(0, 2)
    blob = M.encode_mjpeg_mp4(frames)
    with pytest.raises((ValueError, struct.error)):
        M.demux_mjpeg_frames(blob[: len(blob) // 2])


def test_multi_chunk_stsc_expansion():
    """Hand-build a 2-chunk layout (2 + 1 samples) to exercise the
    stsc run expansion the single-chunk muxer never emits."""
    frames = _frames(3, 3)
    blob = bytearray(M.encode_mjpeg_mp4(frames))
    # rewrite stsc to runs [(chunk1, 2 samples), (chunk2, 1 sample)] and
    # stco to two offsets; mdat layout is unchanged (chunks contiguous)
    b = bytes(blob)
    stsc_at = b.index(b"stsc") - 4
    old_stsc = b[stsc_at: stsc_at + struct.unpack(">I", b[stsc_at: stsc_at + 4])[0]]
    new_stsc = M._full_box(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 1, 1),
    )
    stco_at = b.index(b"stco") - 4
    old_stco = b[stco_at: stco_at + struct.unpack(">I", b[stco_at: stco_at + 4])[0]]
    first_off = struct.unpack(">I", old_stco[16:20])[0]
    second_off = first_off + len(frames[0]) + len(frames[1])
    new_stco = M._full_box(
        b"stco", 0, 0, struct.pack(">III", 2, first_off, second_off)
    )
    b = b.replace(old_stsc, new_stsc).replace(old_stco, new_stco)
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov grew)
    delta = (len(new_stsc) - len(old_stsc)) + (len(new_stco) - len(old_stco))
    out = bytearray(b)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = out.index(tag) - 4
        size = struct.unpack(">I", out[at: at + 4])[0]
        out[at: at + 4] = struct.pack(">I", size + delta)
    back = M.demux_mjpeg_frames(bytes(out))
    assert back == frames


def test_decode_real_routes_mjpeg_video():
    from lucene_spark.ops.multimodal import decode_real

    i = 4
    blob = M.synth_mjpeg_mp4(i)
    feat = decode_real(blob, "video")
    px = M.decode_mjpeg_mp4(blob, n_frames=1)[0][1]
    h, w, c = px.shape
    assert feat[:3].tolist() == [w, h, c]
    assert feat[3] == pytest.approx(px.astype(float).mean())
    assert feat[5] == M.fixture_n_frames(i)
    # compressed codec -> still the NotImplementedError seam
    raw = bytearray(blob)
    at = raw.index(b"jpeg", raw.index(b"stsd"))
    raw[at: at + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        decode_real(bytes(raw), "video")


def test_spark_decode_video_frames(spark):
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from lucene_spark.ops.media_headers import synth_mp4

    n = 30

    def payload(i):
        if i % 3 == 2:
            return synth_mp4(i)  # header-only, no track -> null row
        return M.synth_mjpeg_mp4(i)

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "payload": [payload(i) for i in range(n)]}),
        schema,
    ).repartition(6)
    rows = {}
    for r in M.decode_video_frames(df).collect():
        rows.setdefault(r["id"], []).append(r)
    assert set(rows) == set(range(n))
    for i in range(n):
        if i % 3 == 2:
            assert len(rows[i]) == 1 and rows[i][0]["frame_idx"] is None
            continue
        got = sorted(rows[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(M.fixture_n_frames(i)))
        for r in got:
            px = M.fixture_frame_pixels(i, int(r["frame_idx"]))
            want_c = px.shape[2]
            assert (r["height"], r["width"], r["channels"]) == (
                px.shape[0], px.shape[1], want_c,
            )
            # quality-100 encode: stats land near the source frame
            assert abs(r["px_mean"] - px.astype(float).mean()) < 8.0

    # uniform subset: 2 frames per video
    sub = {}
    for r in M.decode_video_frames(df.where("id % 3 != 2"), n_frames=2).collect():
        sub.setdefault(r["id"], []).append(r["frame_idx"])
    for i, idxs in sub.items():
        nf = M.fixture_n_frames(i)
        assert sorted(idxs) == M.uniform_frame_indices(nf, 2)
