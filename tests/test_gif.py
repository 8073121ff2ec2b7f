"""Real GIF decode (ops.gif): hand-computed LZW spec vectors pin the
decoder independently of the in-repo encoder, round-trips cover width
growth / table reset / interlace / disposal / transparency, and the
Spark image kernel routes GIF payloads row-exactly."""

import numpy as np
import pytest

from lucene_spark.ops.gif import (
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    fixture_gif_indices,
    fixture_gif_palette,
    gif_frame_count,
    lzw_decode,
    lzw_encode,
    parse_gif_header,
    synth_gif_pixels,
)

PAL = np.arange(48, dtype=np.uint8).reshape(16, 3) * 5


# --- LZW: hand vectors straight from the spec packing rules ---

def test_lzw_hand_vector_1x1():
    # mcs=2: codes clear(4), literal 1, end(5), each 3 bits, LSB-first:
    # 4 | 1<<3 | 5<<6 = 0x14C -> bytes 4C 01
    assert lzw_encode(np.array([1], dtype=np.uint8), 2) == bytes([0x4C, 0x01])
    assert lzw_decode(bytes([0x4C, 0x01]), 2, 1).tolist() == [1]


def test_lzw_kwkwk_special_case():
    # "aaa" forces the decoder to resolve a code equal to the next
    # unassigned table slot (the KwKwK case)
    enc = lzw_encode(np.array([0, 0, 0], dtype=np.uint8), 2)
    assert lzw_decode(enc, 2, 3).tolist() == [0, 0, 0]


@pytest.mark.parametrize("mcs", [2, 3, 4, 7, 8])
def test_lzw_roundtrip_width_growth(mcs):
    rng = np.random.default_rng(mcs)
    hi = 1 << mcs
    for n in (1, 2, 3, 10, 100, 5000):
        seq = rng.integers(0, hi, size=n, dtype=np.uint8)
        assert np.array_equal(lzw_decode(lzw_encode(seq, mcs), mcs, n), seq)
    # long runs: deep chains + repeated KwKwK
    seq = np.repeat(rng.integers(0, hi, size=200, dtype=np.uint8), 97)
    assert np.array_equal(
        lzw_decode(lzw_encode(seq, mcs), mcs, len(seq)), seq
    )


def test_lzw_table_reset_past_4096_codes():
    rng = np.random.default_rng(99)
    seq = rng.integers(0, 256, size=60000, dtype=np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(seq, 8), 8, len(seq)), seq)


def test_lzw_rejects_garbage():
    with pytest.raises(GifError):
        lzw_decode(b"", 2, 4)  # truncated
    with pytest.raises(GifError):
        lzw_decode(bytes([0xFC, 0x01]), 2, 2)  # first code not a literal
    with pytest.raises(GifError):
        lzw_decode(bytes([0x4C]), 2, 50)  # ends mid-image


# --- container round trips ---

def test_single_frame_roundtrip_and_header():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 16, size=(13, 17), dtype=np.uint8)
    blob = encode_gif((17, 13), [{"indices": idx}], PAL)
    assert parse_gif_header(blob) == (17, 13, 3)
    got = decode_gif(blob)
    assert got.shape == (13, 17, 3)
    assert np.array_equal(got, PAL[idx])
    assert gif_frame_count(blob) == 1


def test_interlaced_frame_roundtrips_identically():
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 16, size=(13, 17), dtype=np.uint8)
    plain = encode_gif((17, 13), [{"indices": idx}], PAL)
    laced = encode_gif((17, 13), [{"indices": idx, "interlace": True}], PAL)
    assert np.array_equal(decode_gif(laced), decode_gif(plain))


def test_multiframe_compositing_and_disposal():
    f0 = np.zeros((4, 4), dtype=np.uint8)
    f1 = np.full((2, 2), 1, dtype=np.uint8)
    blob = encode_gif(
        (4, 4),
        [
            {"indices": f0},
            {"indices": f1, "left": 1, "top": 1, "disposal": 3},
            {"indices": np.array([[2]], dtype=np.uint8)},
        ],
        PAL,
    )
    fr = decode_gif_frames(blob)
    assert len(fr) == gif_frame_count(blob) == 3
    assert (fr[0][:, :, :3] == PAL[0]).all() and (fr[0][:, :, 3] == 255).all()
    assert np.array_equal(fr[1][1:3, 1:3, :3], np.broadcast_to(PAL[1], (2, 2, 3)))
    # disposal 3 restores the pre-frame canvas before frame 2 draws
    assert np.array_equal(fr[2][1:3, 1:3, :3], np.broadcast_to(PAL[0], (2, 2, 3)))
    assert np.array_equal(fr[2][0, 0, :3], PAL[2])


def test_disposal_2_clears_subrect_to_transparent():
    f0 = np.zeros((3, 3), dtype=np.uint8)
    blob = encode_gif(
        (3, 3),
        [
            {"indices": f0, "disposal": 2},
            {"indices": np.array([[1]], dtype=np.uint8)},
        ],
        PAL,
    )
    fr = decode_gif_frames(blob)
    assert (fr[0][:, :, 3] == 255).all()
    assert fr[1][0, 0, 3] == 255  # frame 2's own pixel
    assert (fr[1][1:, :, 3] == 0).all()  # cleared back to transparent


def test_transparent_index_preserves_canvas():
    # partial first frame with a transparent pixel -> RGBA, alpha 0
    frame = {"indices": np.array([[0, 1]], dtype=np.uint8), "transparent": 1}
    got = decode_gif(encode_gif((3, 2), [frame], PAL))
    assert got.shape == (2, 3, 4)
    assert got[0, 0, 3] == 255 and got[0, 1, 3] == 0 and got[1, 0, 3] == 0


def test_local_palette_overrides_global():
    lp = np.array([[9, 9, 9], [7, 7, 7]], dtype=np.uint8)
    frame = {"indices": np.array([[1]], dtype=np.uint8), "local_palette": lp}
    assert decode_gif(encode_gif((1, 1), [frame], PAL))[0, 0].tolist() == [7, 7, 7]


def test_fixture_closed_form_and_frame_counts():
    for i in (0, 1, 2, 3, 6, 17, 100):
        got = decode_gif(synth_gif_pixels(i))
        want = fixture_gif_palette(i)[fixture_gif_indices(i)]
        assert np.array_equal(got[:, :, :3], want), i
        h, w = fixture_gif_indices(i).shape
        want_frames = 2 if (i % 3 == 0 and h >= 3 and w >= 3) else 1
        assert gif_frame_count(synth_gif_pixels(i)) == want_frames, i


def test_rejects_malformed():
    good = synth_gif_pixels(5)
    for bad in (
        b"NOTGIF" + good[6:],
        b"GIF89a" + b"\x00" * 4,  # truncated screen descriptor
        good[:-5],  # trailer cut off
        good[:20],  # mid-palette
    ):
        with pytest.raises((GifError, ValueError)):
            decode_gif(bad)
    assert parse_gif_header(b"NOTGIF") is None


def test_parse_image_header_routes_gif():
    from lucene_spark.ops.media_headers import parse_image_header

    blob = synth_gif_pixels(4)
    h, w = fixture_gif_indices(4).shape
    assert parse_image_header(blob) == ("gif", w, h, 3)


# --- decode_real routing ---

def test_decode_real_gif_vs_closed_form():
    from lucene_spark.ops.multimodal import FEATURE_DIM, decode_real

    i = 7  # odd -> interlaced; not %3==0 -> single frame
    blob = synth_gif_pixels(i)
    want = fixture_gif_palette(i)[fixture_gif_indices(i)].astype(np.float64)
    h, w = fixture_gif_indices(i).shape
    feat = decode_real(blob, "image")
    assert feat.shape == (FEATURE_DIM,)
    assert feat[:3].tolist() == [w, h, 3]
    assert feat[3] == pytest.approx(want.mean())
    assert feat[4] == pytest.approx(want.std())
    assert feat[5] == 1  # frame count


# --- Spark kernel routing ---

def test_spark_decode_image_pixels_routes_gif(spark):
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from lucene_spark.ops.media_decode import (
        decode_image_pixels, synth_png_pixels,
    )

    n = 24

    def payload(i):
        return synth_gif_pixels(i) if i % 2 == 0 else synth_png_pixels(i)

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "payload": [payload(i) for i in range(n)]}),
        schema,
    ).repartition(4)
    rows = {r["id"]: r for r in decode_image_pixels(df).collect()}
    assert len(rows) == n
    for i in range(0, n, 2):
        first = fixture_gif_palette(i)[fixture_gif_indices(i)]
        h, w = first.shape[:2]
        # ids with a transparent second frame still report frame 0's
        # composite; channels match decode_gif's opaque/RGBA rule
        want = decode_gif(synth_gif_pixels(i))
        f = want.astype(np.float64)
        r = rows[i]
        assert (r["height"], r["width"]) == (h, w)
        assert r["channels"] == want.shape[2]
        assert r["px_mean"] == pytest.approx(f.mean())
        assert r["px_std"] == pytest.approx(f.std())
        assert (r["px_min"], r["px_max"]) == (want.min(), want.max())
