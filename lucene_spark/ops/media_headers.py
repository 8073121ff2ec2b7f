"""Stdlib-only media header parsing: real metadata from raw bytes.

The container ships no PIL/ffmpeg, but PNG/JPEG (dimensions), RIFF/WAV
(channels/rate/sample count) and ISO-BMFF/MP4 (timescale/duration)
all carry their metadata in fixed, documented header structures, so
the multimodal pipeline can extract REAL values with pure-Python byte
parsing — no external libs, no full decode:

- PNG (RFC 2083): 8-byte signature ``\\x89PNG\\r\\n\\x1a\\n``, then the
  IHDR chunk (always first): 4-byte length, ``IHDR``, width (u32 BE),
  height (u32 BE), bit depth (u8), color type (u8). Channels follow
  from the color type: 0 grayscale→1, 2 truecolor→3, 3 palette→1,
  4 gray+alpha→2, 6 RGBA→4.
- JPEG (ITU T.81): ``\\xff\\xd8`` SOI, then a marker stream; the
  frame header SOFn (0xC0-0xCF except DHT 0xC4 / DAC 0xCC / RST) holds
  precision (u8), height (u16 BE), width (u16 BE), component count
  (u8 — 1 grayscale, 3 YCbCr).

``parse_image_header`` is the per-blob kernel used by
``ops.multimodal.extract_features``'s mapInPandas stage (the Arrow
batch flow is unchanged — this covers the header part; full PNG
pixel / WAV PCM decode is real too, in ``ops.media_decode``, and
``decode_real`` keeps the NotImplementedError seam only for the
codec-bound formats, JPEG and MP4).

The fixture generators emit byte-valid headers whose dimensions are a
deterministic function of an integer id, so a SQL oracle can verify
``parse(synth(id)) == formula(id)`` end-to-end without any image
library on either side.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# SOFn markers that carry frame dimensions (T.81 §B.2.2). C4/C8/CC are
# DHT/JPG/DAC — table segments, not frames.
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_png_header(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from a PNG's IHDR, or None if the blob
    is not a well-formed PNG prefix."""
    if len(blob) < 29 or not blob.startswith(PNG_SIG):
        return None
    if blob[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", blob[16:24])
    color_type = blob[25]
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None or width == 0 or height == 0:
        return None
    return int(width), int(height), channels


def parse_jpeg_header(blob: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from the first SOFn segment, or None.

    Walks the marker stream: each non-SOI/EOI/RSTn marker is
    ``FF mm LL LL payload`` with LL including its own two bytes.
    """
    if len(blob) < 4 or blob[0] != 0xFF or blob[1] != 0xD8:
        return None
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            return None  # desynced marker stream
        marker = blob[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone marker, no length
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            seg = blob[i + 4 : i + 2 + seg_len]
            if len(seg) < 6:
                return None
            height, width = struct.unpack(">HH", seg[1:5])
            channels = seg[5]
            if width == 0 or height == 0 or channels == 0:
                return None
            return int(width), int(height), int(channels)
        if marker == 0xDA:  # SOS — entropy data follows; SOF must precede
            return None
        i += 2 + seg_len
    return None


def parse_wav_header(blob: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, n_samples) from a RIFF/
    WAVE header, or None if the blob is not a well-formed WAV prefix.

    Walks the chunk list (each ``4-byte tag + u32 LE size + payload``,
    sizes padded to even offsets per RIFF): the ``fmt `` chunk carries
    channels/rate/bits, the ``data`` chunk's SIZE gives
    ``n_samples = size / block_align`` — no sample decode needed.
    """
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i, n = 12, len(blob)
    channels = rate = bits = block_align = None
    n_samples = None
    while i + 8 <= n:
        tag = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        if tag == b"fmt " and size >= 16 and i + 8 + 16 <= n:
            (_fmt, channels, rate, _brate, block_align, bits) = struct.unpack(
                "<HHIIHH", blob[i + 8 : i + 8 + 16]
            )
        elif tag == b"data":
            if block_align:
                n_samples = size // block_align
            else:
                return None  # data before fmt — malformed for our needs
            break
        i += 8 + size + (size & 1)
    if not channels or not rate or n_samples is None:
        return None
    return int(channels), int(rate), int(bits), int(n_samples)


def parse_mp4_header(blob: bytes) -> tuple[int, int] | None:
    """(timescale, duration_units) from an ISO-BMFF (MP4) ``moov/mvhd``
    box, or None. Walks top-level boxes (u32 BE size + 4-byte type),
    descends into ``moov``, reads the movie header: version byte, 3
    flag bytes, then (version 0) ctime u32, mtime u32, timescale u32,
    duration u32 — version 1 uses u64 times/duration."""
    i, n = 0, len(blob)
    while i + 8 <= n:
        size = struct.unpack(">I", blob[i : i + 4])[0]
        box = blob[i + 4 : i + 8]
        if size < 8 or i + size > n:
            return None
        if box == b"moov":
            j, end = i + 8, i + size
            while j + 8 <= end:
                s2 = struct.unpack(">I", blob[j : j + 4])[0]
                b2 = blob[j + 4 : j + 8]
                if s2 < 8 or j + s2 > end:
                    return None
                if b2 == b"mvhd":
                    version = blob[j + 8]
                    if version == 0 and s2 >= 8 + 4 + 16:
                        ts, dur = struct.unpack(
                            ">II", blob[j + 20 : j + 28]
                        )
                    elif version == 1 and s2 >= 8 + 4 + 28:
                        ts = struct.unpack(">I", blob[j + 28 : j + 32])[0]
                        dur = struct.unpack(">Q", blob[j + 32 : j + 40])[0]
                    else:
                        return None
                    if ts == 0:
                        return None
                    return int(ts), int(dur)
                j += s2
            return None
        i += size
    return None


def parse_image_header(blob: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, channels) for PNG, JPEG or GIF bytes,
    None for anything else. The dispatch is by magic bytes — cheap
    enough to run per-blob inside an Arrow batch kernel."""
    png = parse_png_header(blob)
    if png is not None:
        return ("png",) + png
    jpg = parse_jpeg_header(blob)
    if jpg is not None:
        return ("jpeg",) + jpg
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from lucene_spark.ops.gif import parse_gif_header

        gif = parse_gif_header(blob)
        if gif is not None:
            return ("gif",) + gif
    return None


# ------------------------------------------------------------ fixtures
#
# Deterministic, byte-valid synthetic media. Dimensions are a pure
# function of the id (the same arithmetic a SQL oracle can evaluate):
#   width    = 16 + id % 640
#   height   = 16 + (id * 7) % 480
#   png: RGBA when id % 2 == 0 (4 channels) else truecolor (3)
#   jpeg: grayscale when id % 3 == 0 (1 component) else YCbCr (3)


def fixture_dims(i: int) -> tuple[int, int]:
    return 16 + i % 640, 16 + (i * 7) % 480


def synth_png(i: int) -> bytes:
    """Minimal complete PNG: signature + IHDR + IDAT(empty filter rows
    omitted — a 0-byte zlib stream keeps decoders honest about length
    without carrying pixels) + IEND. Header-parse-valid AND chunk-CRC
    valid."""
    w, h = fixture_dims(i)
    color_type = 6 if i % 2 == 0 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"")

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
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synth_jpeg(i: int) -> bytes:
    """Minimal JPEG marker stream: SOI + APP0(JFIF) + SOF0 + EOI. The
    SOF0 carries real dimensions; no scan data (header parse stops at
    SOF)."""
    w, h = fixture_dims(i)
    ncomp = 1 if i % 3 == 0 else 3
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_payload = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(">BBB", c + 1, 0x11, 0) for c in range(ncomp)
    )
    out = b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += b"\xff\xc0" + struct.pack(">H", len(sof_payload) + 2) + sof_payload
    out += b"\xff\xd9"
    return out


def synth_media(i: int) -> bytes:
    """Round-robin PNG/JPEG by id parity of ``i % 2`` at the format
    level: even ids PNG, odd ids JPEG — both branches byte-valid."""
    return synth_png(i) if i % 2 == 0 else synth_jpeg(i)


# audio/video fixture formulas (mirrored verbatim in the mm_audio /
# mm_video gate oracles):
#   wav: rate     = [8000, 16000, 22050, 44100][id % 4]
#        channels = 1 + id % 2, bits = 16
#        n_samples = 256 + (id * 13) % 1024
#   mp4: timescale = [600, 1000, 90000][id % 3]
#        duration_units = 1000 + (id * 17) % 9000

WAV_RATES = (8000, 16000, 22050, 44100)
MP4_TIMESCALES = (600, 1000, 90000)


def fixture_audio(i: int) -> tuple[int, int, int]:
    """(sample_rate, channels, n_samples) as a pure function of id."""
    return WAV_RATES[i % 4], 1 + i % 2, 256 + (i * 13) % 1024


def fixture_video(i: int) -> tuple[int, int]:
    """(timescale, duration_units) as a pure function of id."""
    return MP4_TIMESCALES[i % 3], 1000 + (i * 17) % 9000


def synth_wav(i: int) -> bytes:
    """Complete byte-valid 16-bit PCM WAV with zeroed sample data sized
    to the fixture's n_samples (so the data-chunk length — the thing
    the parser derives n_samples from — is real, not just claimed)."""
    rate, channels, n_samples = fixture_audio(i)
    bits = 16
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_mp4(i: int) -> bytes:
    """Minimal ISO-BMFF stream: ftyp + moov(mvhd v0). The mvhd carries
    the fixture's timescale/duration; no media data."""
    ts, dur = fixture_video(i)

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + tag + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">B", 0) + b"\x00\x00\x00"       # version 0 + flags
        + struct.pack(">II", 0, 0)                    # ctime, mtime
        + struct.pack(">II", ts, dur)                 # timescale, duration
        + struct.pack(">I", 0x00010000)               # rate 1.0
        + struct.pack(">H", 0x0100) + b"\x00" * 10    # volume + reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                                # pre_defined
        + struct.pack(">I", 2),                       # next_track_id
    )
    return ftyp + box(b"moov", mvhd)
