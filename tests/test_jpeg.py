"""Baseline JPEG codec: spec vectors, hand-crafted streams, round-trips.

The hand-crafted byte streams and spec literals pin the DECODER
independently of the encoder, so a symmetric bug (e.g. a transposed
zigzag in both directions) cannot cancel out.
"""

import struct

import numpy as np
import pytest

from lucene_spark.ops import jpeg as J
from lucene_spark.ops.media_decode import UnsupportedMediaError

# The spec's zigzag table, typed as the literal natural-order index of
# each zigzag position (row*8+col) — independent of the module's
# diagonal-walk generator.
SPEC_ZIGZAG_NAT = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_spec_literal():
    assert list(J.ZIGZAG_NAT) == SPEC_ZIGZAG_NAT


def test_dct_matrix_matches_direct_definition():
    # T.81 FDCT: S(u,v) = 1/4 c(u) c(v) sum_x sum_y s(x,y)
    #            cos((2x+1)u pi/16) cos((2y+1)v pi/16)
    rng = np.random.RandomState(7)
    s = rng.randint(-128, 128, size=(8, 8)).astype(np.float64)
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            acc = 0.0
            for x in range(8):
                for y in range(8):
                    acc += (
                        s[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[u, v] = 0.25 * cu * cv * acc
    via_matrix = J.DCT_T @ s @ J.DCT_T.T
    assert np.abs(via_matrix - direct).max() < 1e-9
    # orthogonality => IDCT is the transpose pair
    assert np.abs(J.DCT_T @ J.DCT_T.T - np.eye(8)).max() < 1e-12


def test_huffman_tables_structurally_valid_and_complete():
    for bits, vals in [
        (J.DC_LUM_BITS, J.DC_LUM_VALS),
        (J.DC_CHROM_BITS, J.DC_CHROM_VALS),
        (J.AC_LUM_BITS, J.AC_LUM_VALS),
        (J.AC_CHROM_BITS, J.AC_CHROM_VALS),
    ]:
        assert sum(bits) == len(vals)
        assert len(set(vals)) == len(vals)
        J._canonical_codes(bits, vals)  # must not overflow (prefix-free)
    # every symbol the encoder can emit exists in the AC tables
    needed = {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    assert needed <= set(J.AC_LUM_VALS)
    assert needed <= set(J.AC_CHROM_VALS)
    assert set(J.DC_LUM_VALS) >= set(range(12))


def test_canonical_codes_match_annex_k_examples():
    # Annex K Table K.3 (DC luminance): category -> code string
    dc = J._canonical_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)
    expect = {0: "00", 1: "010", 2: "011", 3: "100", 4: "101", 5: "110",
              6: "1110", 7: "11110", 8: "111110", 9: "1111110",
              10: "11111110", 11: "111111110"}
    for cat, bits_str in expect.items():
        code, ln = dc[cat]
        assert ln == len(bits_str) and code == int(bits_str, 2)
    # Annex K Table K.5 (AC luminance): EOB = 1010, ZRL = 11111111001
    ac = J._canonical_codes(J.AC_LUM_BITS, J.AC_LUM_VALS)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)


# --------------------------------------------- hand-crafted JPEG streams


def _handcrafted_gray_8x8(scan_bytes: bytes, q0: int, q_rest: int = 1) -> bytes:
    """Minimal 8x8 grayscale baseline JPEG assembled by hand: DQT with
    zigzag-first element q0 (rest q_rest), Annex K DC/AC luminance DHT,
    SOF0, SOS, the given entropy bytes."""
    out = bytearray(b"\xff\xd8")
    qt = bytes([q0] + [q_rest] * 63)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 8, 8)
    out += b"\x01" + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(J.DC_LUM_VALS))
    out += b"\x00" + bytes(J.DC_LUM_BITS) + bytes(J.DC_LUM_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(J.AC_LUM_VALS))
    out += b"\x10" + bytes(J.AC_LUM_BITS) + bytes(J.AC_LUM_VALS)
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01" + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    out += scan_bytes
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_all_zero_block_decodes_to_128():
    # DC category 0 ('00') + EOB ('1010') + 1-padding = 0b00101011
    blob = _handcrafted_gray_8x8(bytes([0b00101011]), q0=1)
    px = J.decode_baseline_jpeg(blob)
    assert px.shape == (8, 8, 1)
    assert (px == 128).all()


def test_handcrafted_dc_only_block():
    # DC category 2 ('011') + magnitude bits '11' (EXTEND -> +3),
    # EOB ('1010'): 011 11 1010 -> 0b01111101, 0b0 + 1-padding -> 0b01111111
    # dequant DC = 3 * 16 = 48 -> spatial 48/8 = 6 -> every pixel 134.
    blob = _handcrafted_gray_8x8(bytes([0b01111101, 0b01111111]), q0=16)
    px = J.decode_baseline_jpeg(blob)
    assert (px == 134).all()


def test_handcrafted_negative_dc():
    # category 2 with magnitude bits '00' EXTENDs to -3: pixels 128-6=122
    blob = _handcrafted_gray_8x8(bytes([0b01100101, 0b01111111]), q0=16)
    px = J.decode_baseline_jpeg(blob)
    assert (px == 122).all()


def test_handcrafted_single_ac_coefficient():
    # DC cat 0 ('00'), then AC (run 0, size 1) -> symbol 0x01.
    # Annex K: 0x01 is the FIRST 2-bit code = '00'. Magnitude bit '1' = +1.
    # Then EOB '1010'. Bits: 00 00 1 1010 + pad -> 0b00001101, 0b01111111.
    # Coefficient lands at zigzag k=1 = natural (0, 1); with the AC
    # quant entries set to 99 the dequantized S[0,1] = 99 produces a
    # visibly non-constant cosine pattern (pins dezigzag + AC dequant +
    # IDCT placement, not just the DC path).
    blob = _handcrafted_gray_8x8(bytes([0b00001101, 0b01111111]), q0=1, q_rest=99)
    px = J.decode_baseline_jpeg(blob).astype(np.float64)[:, :, 0]
    expect = np.zeros((8, 8))
    expect[0, 1] = 99.0
    expect = J.DCT_T.T @ expect @ J.DCT_T
    expect = np.clip(np.round(expect) + 128, 0, 255)
    assert px.std() > 5  # genuinely non-constant
    assert (px == expect).all()


# ------------------------------------------------------------ round-trip


def _gradient(h, w, c):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 5) % 256
    if c == 1:
        return base[:, :, None].astype(np.uint8)
    return np.stack(
        [base, (base + 85) % 256, (base + 170) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_constant_gray_exact():
    for v in (0, 37, 128, 255):
        px = np.full((16, 24, 1), v, dtype=np.uint8)
        out = J.decode_baseline_jpeg(J.encode_baseline_jpeg(px, quality=100))
        assert out.shape == (16, 24, 1)
        assert (out == v).all()


def test_roundtrip_gray_quality100_tight():
    rng = np.random.RandomState(3)
    px = _gradient(24, 32, 1)
    noisy = np.clip(
        px.astype(int) + rng.randint(-8, 9, px.shape), 0, 255
    ).astype(np.uint8)
    for img in (px, noisy):
        out = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img, quality=100))
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= 4, err  # only quantize-to-unit + rounding survives


def test_roundtrip_rgb_444_quality100():
    img = _gradient(17, 19, 3)  # odd dims exercise padding + crop
    out = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img, quality=100))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 6, err  # + color transform rounding both ways


def test_roundtrip_constant_rgb_420():
    img = np.zeros((20, 22, 3), dtype=np.uint8)
    img[:] = (200, 30, 90)
    out = J.decode_baseline_jpeg(
        J.encode_baseline_jpeg(img, quality=100, subsampling="420")
    )
    assert out.shape == img.shape
    # constant color survives box-downsample/replicate exactly, so only
    # the color transform's two roundings remain
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_roundtrip_smooth_rgb_420_reasonable():
    # genuinely smooth (no mod-256 sawtooth edges — those are mangled by
    # chroma subsampling by design, in any 4:2:0 codec)
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [40 + yy * 2 + xx, 30 + yy + xx * 2, 220 - yy * 2 - xx], axis=-1
    ).astype(np.uint8)
    out = J.decode_baseline_jpeg(
        J.encode_baseline_jpeg(img, quality=90, subsampling="420")
    )
    assert out.shape == img.shape
    rmse = np.sqrt(((out.astype(float) - img.astype(float)) ** 2).mean())
    assert rmse < 12.0, rmse


def test_restart_markers_do_not_change_pixels():
    img = _gradient(24, 40, 3)  # 15 MCUs at 4:4:4
    plain = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img, quality=92))
    blob = J.encode_baseline_jpeg(img, quality=92, restart_interval=2)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    with_rst = J.decode_baseline_jpeg(blob)
    assert (plain == with_rst).all()


def test_quality_monotone_and_tables_in_stream():
    img = _gradient(32, 32, 3)
    small = J.encode_baseline_jpeg(img, quality=20)
    big = J.encode_baseline_jpeg(img, quality=95)
    assert len(small) < len(big)
    # decoder reads quant tables FROM THE STREAM: corrupting the DQT
    # payload must change pixels
    out1 = J.decode_baseline_jpeg(big)
    mutated = bytearray(big)
    dqt = big.index(b"\xff\xdb") + 5  # first table byte
    mutated[dqt] = 255
    out2 = J.decode_baseline_jpeg(bytes(mutated))
    assert not (out1 == out2).all()


def test_header_parser_agrees_with_encoder():
    from lucene_spark.ops.media_headers import parse_jpeg_header

    for shape, sub in [((15, 23, 1), "444"), ((40, 9, 3), "444"), ((21, 34, 3), "420")]:
        img = _gradient(*shape)
        w_h_c = parse_jpeg_header(J.encode_baseline_jpeg(img, subsampling=sub))
        assert w_h_c == (shape[1], shape[0], shape[2])


def test_progressive_rejected():
    blob = bytearray(J.encode_baseline_jpeg(_gradient(8, 8, 1)))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(UnsupportedMediaError):
        J.decode_baseline_jpeg(bytes(blob))


def test_jpeg_fixture_roundtrip_shapes():
    from lucene_spark.ops.media_decode import fixture_pixels, synth_jpeg_pixels

    for i in range(24):
        blob = synth_jpeg_pixels(i)
        px = J.decode_baseline_jpeg(blob)
        want = fixture_pixels(i)
        want_c = {1: 1, 2: 1, 3: 3, 4: 3}[want.shape[2]]
        assert px.shape == (want.shape[0], want.shape[1], want_c)


def test_spark_decode_image_pixels_routes_jpeg(spark):
    """Mixed PNG + JPEG + garbage payloads through ONE Spark op; JPEG
    stats must match a driver-side decode of the same bytes row-exactly."""
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from lucene_spark.ops.media_decode import (
        decode_image_pixels,
        synth_jpeg_pixels,
        synth_png_pixels,
    )

    n = 60

    def payload(i):
        if i % 3 == 0:
            return synth_jpeg_pixels(i)
        if i % 3 == 1:
            return synth_png_pixels(i)
        return b"\xff\xd8\x00garbage"  # JPEG SOI then junk -> null row

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "payload": [payload(i) for i in range(n)]}),
        schema,
    ).repartition(8)
    rows = {r["id"]: r for r in decode_image_pixels(df).collect()}
    assert len(rows) == n
    for i in range(n):
        r = rows[i]
        if i % 3 == 2:
            assert r["width"] is None
            continue
        px = J.decode_baseline_jpeg(payload(i)) if i % 3 == 0 else None
        if px is not None:
            f = px.astype(np.float64)
            assert (r["height"], r["width"], r["channels"]) == px.shape
            assert abs(r["px_mean"] - f.mean()) < 1e-9
            assert abs(r["px_std"] - f.std()) < 1e-9
            assert (r["px_min"], r["px_max"]) == (px.min(), px.max())
        else:
            assert r["width"] is not None  # PNG path still works


def test_extract_features_real_decodes_jpeg(spark):
    import pandas as pd
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from pyspark.sql import functions as F

    from lucene_spark.ops.media_decode import synth_jpeg_pixels
    from lucene_spark.ops.multimodal import extract_features

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(12), "payload": [synth_jpeg_pixels(i) for i in range(12)]}),
        schema,
    ).withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.substring(F.sha2(F.col("payload"), 256), 1, 16).alias("sha_prefix"),
        ),
    )
    feats = {
        r["id"]: r["feature"]
        for r in extract_features(df, decoder="real").collect()
    }
    for i in range(12):
        px = J.decode_baseline_jpeg(synth_jpeg_pixels(i))
        h, w, c = px.shape
        f = px.astype(np.float64)
        got = feats[i]
        assert got is not None
        assert got[:3] == [w, h, c]
        assert abs(got[3] - f.mean()) < 1e-9
        assert abs(got[4] - f.std()) < 1e-9


def test_truncated_and_garbage_rejected():
    img = _gradient(16, 16, 1)
    blob = J.encode_baseline_jpeg(img)
    with pytest.raises(ValueError):
        J.decode_baseline_jpeg(blob[:20])  # cut before SOS
    with pytest.raises(ValueError):
        J.decode_baseline_jpeg(b"\x00\x01\x02")
