"""Real PNG/WAV decode (ops.media_decode): hand-computed spec vectors
pin the decoder independently of the in-repo encoder, round-trips
cover the full filter × channel matrix, and the Spark ops are checked
row-exactly against driver-side decodes."""

import struct
import zlib

import numpy as np
import pytest

from lucene_spark.ops.media_decode import (
    UnsupportedMediaError,
    decode_png,
    decode_wav,
    encode_png,
    fixture_pixels,
    fixture_samples,
    synth_png_pixels,
    synth_wav_pcm,
)
from lucene_spark.ops.media_headers import PNG_SIG, synth_jpeg, synth_png


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw, depth=8, interlace=0, idat_split=1):
    """Build PNG bytes straight from the spec — no encode_png involved."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0,
                       interlace)
    z = zlib.compress(raw)
    step = max(1, len(z) // idat_split)
    idats = b"".join(
        _chunk(b"IDAT", z[i : i + step]) for i in range(0, len(z), step)
    )
    return PNG_SIG + _chunk(b"IHDR", ihdr) + idats + _chunk(b"IEND", b"")


# --- hand-computed spec vectors (PNG filter semantics, W3C spec §6) ---

def test_sub_filter_gray_hand_vector():
    # recon[x] = raw[x] + recon[x-1] mod 256
    raw = bytes([1, 10, 20, 30, 250])
    px = decode_png(_png(4, 1, 0, raw))
    assert px.reshape(-1).tolist() == [10, 30, 60, 54]


def test_sub_filter_rgb_lane_separation():
    # Sub must offset by bpp=3, not 1: px1 = px0 + delta per channel
    raw = bytes([1, 10, 20, 30, 5, 6, 7])
    px = decode_png(_png(2, 1, 2, raw))
    assert px[0, 0].tolist() == [10, 20, 30]
    assert px[0, 1].tolist() == [15, 26, 37]


def test_up_filter_hand_vector():
    raw = bytes([0, 5, 10, 200, 2, 100, 150, 60])
    px = decode_png(_png(3, 2, 0, raw))
    assert px[0].reshape(-1).tolist() == [5, 10, 200]
    assert px[1].reshape(-1).tolist() == [105, 160, 4]  # 260 % 256


def test_average_filter_hand_vector():
    # row0 None [4,8,100]; row1 Avg raw [10,20,200]:
    # 10+(0+4)//2=12; 20+(12+8)//2=30; 200+(30+100)//2=265%256=9
    raw = bytes([0, 4, 8, 100, 3, 10, 20, 200])
    px = decode_png(_png(3, 2, 0, raw))
    assert px[1].reshape(-1).tolist() == [12, 30, 9]


def test_paeth_filter_hand_vector():
    # row0 None [100,200]; row1 Paeth raw [50,60]:
    # x0: a=0,b=100,c=0 -> pred=b=100 -> 150
    # x1: a=150,b=200,c=100 -> p=250, pa=100 pb=50 pc=150 -> pred=b -> 260%256=4
    raw = bytes([0, 100, 200, 4, 50, 60])
    px = decode_png(_png(2, 2, 0, raw))
    assert px[1].reshape(-1).tolist() == [150, 4]


def test_average_first_row_uses_zero_prior():
    # 1 row Avg, prior=0: 10+(0)//2=10; 10+(10+0)//2=15; 9+(15)//2=16
    raw = bytes([3, 10, 10, 9])
    px = decode_png(_png(3, 1, 0, raw))
    assert px.reshape(-1).tolist() == [10, 15, 16]


# --- round-trips over the full filter x channel matrix ---

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_single_filter(channels, filt):
    rng = np.random.default_rng(channels * 10 + filt)
    px = rng.integers(0, 256, size=(9, 7, channels), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px, filters=(filt,))), px)


def test_roundtrip_mixed_filters_and_fixture_ids():
    for i in (0, 1, 2, 3, 5, 17, 100, 1023):
        px = fixture_pixels(i)
        got = decode_png(synth_png_pixels(i))
        assert np.array_equal(got, px), i


def test_multi_idat_chunks_concatenate():
    px = fixture_pixels(42)
    h, w, c = px.shape
    from lucene_spark.ops.media_decode import _filter_rows

    raw = _filter_rows(px.reshape(h, w * c).astype(np.uint8), w, c, (0, 2))
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    assert np.array_equal(decode_png(_png(w, h, ct, raw, idat_split=5)), px)


# --- rejections ---

def test_rejects_invalid_depth_color_combos():
    # spec table 11.1: these (depth, color type) pairs are illegal
    raw = bytes([0, 1, 2])
    with pytest.raises(ValueError):
        decode_png(_png(2, 1, 2, raw, depth=4))  # sub-8 truecolor
    with pytest.raises(ValueError):
        decode_png(_png(2, 1, 3, raw, depth=16))  # 16-bit palette
    with pytest.raises(ValueError):
        decode_png(_png(2, 1, 4, raw, depth=2))  # sub-8 gray+alpha
    with pytest.raises(UnsupportedMediaError):
        decode_png(_png(2, 1, 0, raw, interlace=2))  # nonstandard


# --- bit depths beyond 8 (hand vectors first, then round trips) ---

def test_gray16_hand_vector():
    # filter 0, big-endian u16 samples straight from the spec layout
    raw = bytes([0, 0x01, 0x02, 0xFF, 0x00])
    px = decode_png(_png(2, 1, 0, raw, depth=16))
    assert px.dtype == np.uint16
    assert px.reshape(-1).tolist() == [0x0102, 0xFF00]


def test_sub_filter_16bit_acts_on_bytes():
    # PNG filters are BYTE-level with a 2-byte delta at depth 16:
    # px1 bytes = px0 bytes + raw bytes, per byte lane mod 256
    raw = bytes([1, 0x01, 0xFF, 0x00, 0x02])
    px = decode_png(_png(2, 1, 0, raw, depth=16))
    assert px.reshape(-1).tolist() == [0x01FF, 0x0101]  # 0xFF+0x02 = 0x101


def test_gray1_hand_vector_with_row_padding():
    # width 10 crosses a byte boundary: MSB-first bits, zero pad bits
    raw = bytes([0, 0b10101010, 0b10000000])
    px = decode_png(_png(10, 1, 0, raw, depth=1))
    assert px.reshape(-1).tolist() == [255, 0] * 5  # scaled x255


def test_gray2_and_gray4_scaling():
    raw = bytes([0, 0b01101100])  # samples 1, 2, 3 at depth 2
    px = decode_png(_png(3, 1, 0, raw, depth=2))
    assert px.reshape(-1).tolist() == [85, 170, 255]  # x85 exact
    raw = bytes([0, 0x12, 0x30])  # samples 1, 2, 3 at depth 4
    px = decode_png(_png(3, 1, 0, raw, depth=4))
    assert px.reshape(-1).tolist() == [17, 34, 51]  # x17 exact


def test_palette4_hand_vector():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    ihdr = struct.pack(">IIBBBBB", 3, 1, 4, 3, 0, 0, 0)
    raw = bytes([0, 0x12, 0x30])  # indices 1, 2, 3 packed 4-bit
    blob = (
        PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    px = decode_png(blob)
    assert px[0].tolist() == [[0, 255, 0], [0, 0, 255], [9, 9, 9]]


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_16bit(channels):
    rng = np.random.default_rng(channels)
    px = rng.integers(0, 65536, size=(9, 7, channels), dtype=np.uint16)
    got = decode_png(encode_png(px, depth=16))
    assert got.dtype == np.uint16
    assert np.array_equal(got, px)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_roundtrip_sub8_gray(depth):
    rng = np.random.default_rng(depth)
    samples = rng.integers(0, 1 << depth, size=(11, 13), dtype=np.uint8)
    got = decode_png(encode_png(samples, depth=depth))
    assert np.array_equal(got[:, :, 0], samples * (255 // ((1 << depth) - 1)))


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_roundtrip_sub8_palette(depth):
    rng = np.random.default_rng(depth + 10)
    pal = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
    idx = rng.integers(0, 1 << depth, size=(10, 9), dtype=np.uint8)
    got = decode_png(encode_png(idx, depth=depth, palette=pal))
    assert np.array_equal(got, pal[idx])


# --- Adam7 interlacing ---

def test_adam7_hand_vector():
    # 4x4 gray8, v[y][x] = 16y + x; the seven passes reduce to:
    # p1 -> (0,0); p4 -> (0,2); p5 -> (2,0),(2,2);
    # p6 -> (0,1),(0,3),(2,1),(2,3); p7 -> rows 1 and 3 whole
    raw = bytes(
        [0, 0]                      # pass 1
        + [0, 2]                    # pass 4
        + [0, 32, 34]               # pass 5
        + [0, 1, 3, 0, 33, 35]      # pass 6
        + [0, 16, 17, 18, 19, 0, 48, 49, 50, 51]  # pass 7
    )
    px = decode_png(_png(4, 4, 0, raw, interlace=1))
    want = np.arange(4)[:, None] * 16 + np.arange(4)[None, :]
    assert np.array_equal(px[:, :, 0], want)


@pytest.mark.parametrize("depth,channels", [(8, 3), (16, 4), (4, 1), (1, 1)])
def test_adam7_roundtrip(depth, channels):
    rng = np.random.default_rng(depth * 10 + channels)
    if depth < 8:
        samples = rng.integers(0, 1 << depth, size=(13, 17), dtype=np.uint8)
        got = decode_png(encode_png(samples, depth=depth, interlace=1))
        scale = 255 // ((1 << depth) - 1)
        assert np.array_equal(got[:, :, 0], samples * scale)
    else:
        dt = np.uint16 if depth == 16 else np.uint8
        px = rng.integers(0, 1 << depth, size=(13, 17, channels)).astype(dt)
        assert np.array_equal(decode_png(encode_png(px, depth=depth,
                                                    interlace=1)), px)


def test_adam7_tiny_canvases_skip_empty_passes():
    rng = np.random.default_rng(7)
    for h in range(1, 6):
        for w in range(1, 6):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            got = decode_png(encode_png(px, interlace=1))
            assert np.array_equal(got, px), (h, w)


# --- gray/truecolor tRNS color keys ---

def test_trns_color_key_gray_and_rgb():
    px = np.array([[[5], [9]], [[9], [5]]], dtype=np.uint8)
    got = decode_png(encode_png(px, trns=struct.pack(">H", 9)))
    assert got.shape == (2, 2, 2)
    assert got[:, :, 1].tolist() == [[255, 0], [0, 255]]
    rgb = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    got = decode_png(encode_png(rgb, trns=struct.pack(">HHH", 4, 5, 6)))
    assert got.shape == (1, 2, 4)
    assert got[0, 0, 3] == 255 and got[0, 1, 3] == 0


def test_trns_color_key_16bit():
    px = np.array([[[300], [64000]]], dtype=np.uint16)
    got = decode_png(encode_png(px, depth=16, trns=struct.pack(">H", 300)))
    assert got.dtype == np.uint16
    assert got[0, 0, 1] == 0 and got[0, 1, 1] == 65535


# --- indexed (palette) PNGs, chunks built straight from the spec ---

def _png_pal(width, height, raw, palette, trns=None):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_palette_png_decodes_via_plte():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    raw = bytes([0, 0, 1, 2]) + bytes([0, 3, 0, 1])  # filter-0 rows of indices
    px = decode_png(_png_pal(3, 2, raw, pal))
    assert px.shape == (2, 3, 3)
    assert px[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert px[1].tolist() == [[255, 255, 255], [255, 0, 0], [0, 255, 0]]


def test_palette_png_trns_alpha():
    pal = bytes([10, 20, 30, 40, 50, 60])
    raw = bytes([0, 0, 1, 1, 0])
    # tRNS covers idx 0 only (alpha 128); idx 1 defaults to opaque
    px = decode_png(_png_pal(4, 1, raw, pal, trns=bytes([128])))
    assert px.shape == (1, 4, 4)
    assert px[0, 0].tolist() == [10, 20, 30, 128]
    assert px[0, 1].tolist() == [40, 50, 60, 255]
    assert px[0, 3].tolist() == [10, 20, 30, 128]


def test_palette_png_indices_go_through_filters():
    # Sub filter applies to the INDEX bytes: recon = cumsum mod 256
    pal = b"".join(bytes([10 * i] * 3) for i in range(5))
    raw = bytes([1, 1, 1, 2])  # reconstructed indices 1, 2, 4
    px = decode_png(_png_pal(3, 1, raw, pal))
    assert px[0].tolist() == [[10] * 3, [20] * 3, [40] * 3]


def test_palette_png_bad_inputs():
    raw = bytes([0, 0, 1])
    with pytest.raises(ValueError):  # index 5 past a 1-entry palette
        decode_png(_png_pal(2, 1, bytes([0, 0, 5]), bytes([1, 2, 3])))
    with pytest.raises(ValueError):  # PLTE not a multiple of 3
        decode_png(_png_pal(2, 1, raw, bytes([1, 2, 3, 4])))
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    no_plte = (
        PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(no_plte)


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_png(synth_jpeg(3))  # not a PNG at all
    with pytest.raises(ValueError):
        decode_png(synth_png(4))  # header-only fixture: empty IDAT
    good = synth_png_pixels(7)
    with pytest.raises((ValueError, zlib.error, struct.error)):
        decode_png(good[: len(good) // 2])


# --- WAV ---

def test_wav_roundtrip_fixture_ids():
    for i in (0, 1, 2, 3, 7, 50):
        want, rate_want = fixture_samples(i)
        got, rate = decode_wav(synth_wav_pcm(i))
        assert rate == rate_want
        assert np.array_equal(got, want), i


def test_wav_pcm8_recentred():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    samples, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000
    assert samples.reshape(-1).tolist() == [-32768, 0, 32512]


def _wav(fmt_tag, channels, rate, bits, data, fmt_extra=b""):
    """WAV bytes straight from the RIFF spec — no synth_wav involved."""
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate,
        rate * channels * bits // 8, channels * bits // 8, bits,
    ) + fmt_extra
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_rejects_compressed_codecs():
    with pytest.raises(UnsupportedMediaError):  # MP3-in-WAV
        decode_wav(_wav(0x55, 2, 44100, 0, b"\x00" * 8))
    with pytest.raises(UnsupportedMediaError):  # MS ADPCM (not IMA)
        decode_wav(_wav(0x02, 1, 8000, 4, b"\x00" * 8))
    with pytest.raises(ValueError):
        decode_wav(synth_jpeg(1))


def _ima_scalar_reference(data, channels, block_align, spb):
    """Textbook per-sample IMA ADPCM decoder (pure Python loops) — an
    independent check on the vectorized kernel."""
    from lucene_spark.ops.media_decode import _IMA_STEPS, _IMA_INDEX_ADJ

    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        block = data[b0 : b0 + block_align]
        preds, idxs, streams = [], [], []
        for c in range(channels):
            p, i = struct.unpack_from("<hB", block, 4 * c)[0], block[4 * c + 2]
            preds.append(p)
            idxs.append(i)
            streams.append([])
        body = block[4 * channels :]
        for w in range(0, len(body), 4 * channels):
            for c in range(channels):
                for byte in body[w + 4 * c : w + 4 * c + 4]:
                    streams[c].append(byte & 0x0F)
                    streams[c].append(byte >> 4)
        rows = [[preds[c] for c in range(channels)]]
        for t in range(spb - 1):
            row = []
            for c in range(channels):
                nib = streams[c][t]
                step = int(_IMA_STEPS[idxs[c]])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                if nib & 8:
                    diff = -diff
                preds[c] = max(-32768, min(32767, preds[c] + diff))
                idxs[c] = max(0, min(88, idxs[c] + int(_IMA_INDEX_ADJ[nib & 7])))
                row.append(preds[c])
            rows.append(row)
        out.extend(rows)
    return np.array(out, dtype=np.int16)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_ima_adpcm_vectorized_matches_scalar(channels):
    from lucene_spark.ops.media_decode import decode_ima_adpcm

    rng = np.random.default_rng(channels)
    spb = 33  # (spb-1) % 8 == 0
    block_align = 4 * channels + (spb - 1) * channels // 2
    data = bytes(rng.integers(0, 256, size=block_align * 5, dtype=np.uint8))
    # clamp the header step indexes into range
    data = bytearray(data)
    for b in range(5):
        for c in range(channels):
            data[b * block_align + 4 * c + 2] %= 89
    data = bytes(data)
    got = decode_ima_adpcm(data, channels, block_align, spb)
    want = _ima_scalar_reference(data, channels, block_align, spb)
    assert np.array_equal(got, want)


def test_wav_ima_adpcm_roundtrip_error_bounded():
    from lucene_spark.ops.media_decode import encode_ima_adpcm_wav

    # a band-limited signal: ADPCM tracks it within the step size
    t = np.arange(4000, dtype=np.float64)
    sig = (8000 * np.sin(t / 50) + 3000 * np.sin(t / 13)).astype(np.int16)
    x = np.stack([sig, -sig], axis=1)
    got, rate = decode_wav(encode_ima_adpcm_wav(x, 16000))
    assert rate == 16000
    assert got.shape == x.shape  # fact chunk trims the padded tail block
    err = np.abs(got.astype(np.int32) - x.astype(np.int32))
    assert err.mean() < 120 and err.max() < 2500, (err.mean(), err.max())


def test_wav_pcm24_sign_extension():
    # 0x000001 -> 0; 0x010000 -> 256; 0x800000 -> -32768; 0xFFFFFF -> -1
    data = bytes([1, 0, 0, 0, 0, 1, 0, 0, 0x80, 0xFF, 0xFF, 0xFF])
    samples, rate = decode_wav(_wav(1, 1, 8000, 24, data))
    assert rate == 8000
    assert samples[:, 0].tolist() == [0, 256, -32768, -1]


def test_wav_pcm32_top_bits():
    data = np.array(
        [1 << 16, -(1 << 31), (1 << 31) - 1, -65536], dtype="<i4"
    ).tobytes()
    samples, _ = decode_wav(_wav(1, 2, 44100, 32, data))
    assert samples.reshape(-1).tolist() == [1, -32768, 32767, -1]


def test_wav_ieee_float_clips_and_scales():
    data = np.array([0.0, 1.0, -1.0, 0.5, 2.5, -3.0], dtype="<f4").tobytes()
    samples, _ = decode_wav(_wav(3, 1, 16000, 32, data))
    assert samples[:, 0].tolist() == [0, 32767, -32767, 16384, 32767, -32767]
    data64 = np.array([0.25, -0.25], dtype="<f8").tobytes()
    samples, _ = decode_wav(_wav(3, 1, 16000, 64, data64))
    assert samples[:, 0].tolist() == [8192, -8192]


def test_wav_g711_known_table_values():
    # CCITT g711.c reference endpoints: µ-law 0x00 -> -32124 (max
    # negative), 0x80 -> +32124, 0xFF/0x7F -> the two zeros;
    # A-law 0x55 -> -8 (min magnitude), 0x2A -> -32256 (max)
    samples, _ = decode_wav(_wav(7, 1, 8000, 8, bytes([0x00, 0x80, 0xFF, 0x7F])))
    assert samples[:, 0].tolist() == [-32124, 32124, 0, 0]
    samples, _ = decode_wav(_wav(6, 1, 8000, 8, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    assert samples[:, 0].tolist() == [-8, 8, -32256, 32256]


def test_wav_g711_tables_are_antisymmetric():
    from lucene_spark.ops.media_decode import _ALAW, _ULAW

    # flipping the sign bit negates the expansion exactly
    assert np.array_equal(_ULAW[:128], -_ULAW[128:])
    assert np.array_equal(_ALAW[:128], -_ALAW[128:])


def test_wav_extensible_unwraps_and_vets_guid():
    tail = bytes.fromhex("000000000010800000aa00389b71")
    extra = struct.pack("<HHI", 22, 16, 0x3) + struct.pack("<H", 1) + tail
    pcm = np.array([123, -456], dtype="<i2").tobytes()
    samples, rate = decode_wav(_wav(0xFFFE, 1, 48000, 16, pcm, fmt_extra=extra))
    assert rate == 48000 and samples[:, 0].tolist() == [123, -456]
    # a vendor SubFormat GUID is a codec we can't claim to decode
    bad = struct.pack("<HHI", 22, 16, 0x3) + struct.pack("<H", 1) + b"\x01" * 14
    with pytest.raises(UnsupportedMediaError):
        decode_wav(_wav(0xFFFE, 1, 48000, 16, pcm, fmt_extra=bad))


def test_legacy_zeroed_wav_decodes():
    from lucene_spark.ops.media_headers import fixture_audio, synth_wav

    samples, rate = decode_wav(synth_wav(5))
    want_rate, want_ch, want_n = fixture_audio(5)
    assert (rate, samples.shape[1], samples.shape[0]) == (
        want_rate, want_ch, want_n,
    )
    assert not samples.any()


# --- decode_real routing ---

def test_decode_real_png_and_wav_vs_local():
    from lucene_spark.ops.multimodal import FEATURE_DIM, decode_real

    blob = synth_png_pixels(9)
    px = fixture_pixels(9).astype(np.float64)
    h, w, c = fixture_pixels(9).shape
    feat = decode_real(blob, "image")
    assert feat.shape == (FEATURE_DIM,)
    assert feat[:3].tolist() == [w, h, c]
    assert feat[3] == pytest.approx(px.mean())
    assert feat[4] == pytest.approx(px.std())

    wblob = synth_wav_pcm(9)
    samples, rate = fixture_samples(9)
    afeat = decode_real(wblob, "audio")
    f = samples.astype(np.float64)
    assert afeat[0] == rate
    assert afeat[2] == samples.shape[0]
    assert afeat[3] == pytest.approx(float(np.sqrt((f * f).mean())))

    # baseline JPEG is now REAL-decoded (ops.jpeg); a header-only JPEG
    # with no scan is malformed input, not a codec gap
    from lucene_spark.ops.media_decode import synth_jpeg_pixels

    jfeat = decode_real(synth_jpeg_pixels(8), "image")
    assert jfeat[2] in (1.0, 3.0) and jfeat[0] > 0
    with pytest.raises(ValueError):
        decode_real(synth_jpeg(2), "image")
    # MP4 frames remain the codec-bound seam
    from lucene_spark.ops.media_headers import synth_mp4

    with pytest.raises(NotImplementedError):
        decode_real(synth_mp4(2), "video")


# --- Spark ops: distributed decode vs driver-side truth ---

def test_spark_decode_ops_row_exact(spark):
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from lucene_spark.ops.media_decode import (
        decode_audio_pcm,
        decode_image_pixels,
    )

    n = 120

    def payload(i):
        if i % 3 == 0:
            return synth_png_pixels(i)
        if i % 3 == 1:
            return synth_wav_pcm(i)
        return synth_png(i)  # header-only PNG: undecodable pixels

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "payload": [payload(i) for i in range(n)]}),
        schema,
    ).repartition(8)

    img = {r["id"]: r for r in decode_image_pixels(df).collect()}
    aud = {r["id"]: r for r in decode_audio_pcm(df).collect()}
    assert len(img) == len(aud) == n
    for i in range(n):
        if i % 3 == 0:
            px = fixture_pixels(i)
            f = px.astype(np.float64)
            r = img[i]
            assert (r["height"], r["width"], r["channels"]) == px.shape
            assert r["px_mean"] == pytest.approx(f.mean())
            assert r["px_std"] == pytest.approx(f.std())
            assert (r["px_min"], r["px_max"]) == (px.min(), px.max())
            assert aud[i]["sample_rate"] is None
        elif i % 3 == 1:
            samples, rate = fixture_samples(i)
            f = samples.astype(np.float64)
            r = aud[i]
            assert (r["sample_rate"], r["channels"], r["n_samples"]) == (
                rate, samples.shape[1], samples.shape[0],
            )
            assert r["rms"] == pytest.approx(float(np.sqrt((f * f).mean())))
            assert r["peak"] == int(np.abs(samples).max())
            assert img[i]["width"] is None
        else:
            assert img[i]["width"] is None
            assert aud[i]["sample_rate"] is None


def test_extract_features_real_decoder(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )

    from lucene_spark.ops.multimodal import extract_features

    def payload(i):
        if i % 3 == 0:
            return synth_png_pixels(i)
        if i % 3 == 1:
            return synth_wav_pcm(i)
        return synth_jpeg(i)  # header-only JPEG (no scan) -> null feature

    n = 30
    rows = pd.DataFrame({"id": range(n), "payload": [payload(i) for i in range(n)]})
    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )
    df = (
        spark.createDataFrame(rows, schema)
        .withColumn(
            "meta",
            F.struct(
                F.when(F.col("id") % 3 == 1, "audio").otherwise("image")
                .alias("media_type"),
                F.length("payload").cast("long").alias("n_bytes"),
                F.substring(F.sha2(F.col("payload"), 256), 1, 16)
                .alias("sha_prefix"),
            ),
        )
    )
    got = {r["id"]: r["feature"] for r in extract_features(df, decoder="real").collect()}
    assert len(got) == n
    for i in range(n):
        if i % 3 == 0:
            px = fixture_pixels(i)
            h, w, c = px.shape
            assert got[i][:3] == [w, h, c], i
            assert got[i][3] == pytest.approx(px.astype(np.float64).mean())
        elif i % 3 == 1:
            samples, rate = fixture_samples(i)
            assert got[i][0] == rate and got[i][2] == samples.shape[0], i
        else:
            assert got[i] is None, i

    with pytest.raises(ValueError):
        extract_features(df, decoder="bogus")
