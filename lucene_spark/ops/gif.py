"""Real GIF decode with the Python standard library + numpy: LZW
expansion, palette resolution, interlacing, and multi-frame
compositing with disposal — no PIL required.

GIF87a/GIF89a per the W3C/CompuServe specification:

- **Screen**: header + logical screen descriptor (canvas size, global
  color table flag/size) + optional global color table.
- **Blocks**: 0x21 extensions (graphic control carries disposal,
  delay, transparency index; others are skipped by sub-block walking),
  0x2C image descriptors (subrect, local color table, interlace flag,
  LZW-compressed index stream), 0x3B trailer.
- **LZW**: GIF's variable-width variant — initial width
  ``min_code_size+1``, clear/end codes, width grows when the table
  reaches ``2**width``, hard cap at 4096 entries (deferred-clear
  streams stop growing and keep emitting 12-bit codes).
- **Interlace**: 4-pass row shuffle (rows 0::8, 4::8, 2::4, 1::2).
- **Compositing**: frames composite onto an RGBA canvas that starts
  fully transparent; disposal 0/1 leave the frame, 2 clears the
  frame's subrect back to transparent, 3 restores the pre-frame
  canvas. Transparent-index pixels never overwrite the canvas.

``encode_gif`` is the inverse direction for fixtures and round-trip
tests (same philosophy as ``media_decode.encode_png``): hand-computed
spec vectors in tests/test_gif.py pin the decoder independently so
the pair can't cancel bugs.

The LZW inner loop is per-code Python (the dictionary protocol is
inherently sequential); GIF payloads are small, and the Spark entry
point (``media_decode.decode_image_pixels``) batches blobs through
Arrow ``mapInPandas`` so a large corpus still decodes as one scan
with per-task memory bounded by the Arrow batch.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")

# interlace passes: (start_row, row_step) — spec appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODES = 4096


class GifError(ValueError):
    """Malformed GIF bytes."""


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------

def lzw_decode(data: bytes, min_code_size: int, npixels: int) -> np.ndarray:
    """Expand a GIF LZW code stream → exactly ``npixels`` uint8 color
    indices. Codes are packed LSB-first; the code width starts at
    ``min_code_size + 1`` and grows by one whenever the decode table
    reaches ``2**width`` (stopping at 12 bits / 4096 entries)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npixels:
        while nbits < code_size:
            if pos >= n:
                raise GifError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:  # first code after (implicit) clear: literal
            if code >= clear:
                raise GifError("first LZW code is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _MAX_CODES:
                table.append(prev + entry[:1])
        elif code == len(table) and code < _MAX_CODES:
            entry = prev + prev[:1]  # the KwKwK special case
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < npixels:
        raise GifError(
            f"LZW stream ended at {len(out)} of {npixels} pixels"
        )
    return np.frombuffer(bytes(out[:npixels]), dtype=np.uint8)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compression of a uint8 index stream (fixture/round-trip
    direction). Emits a leading clear code and resets the table when
    it fills, keeping the width progression in lockstep with
    :func:`lzw_decode`."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    emit(clear)
    w = b""
    for k in bytes(np.asarray(indices, dtype=np.uint8).reshape(-1)):
        if k >= clear:
            raise GifError(f"index {k} needs a wider min code size")
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        # the decoder appends an entry for this code, then widens when
        # its table hits 2**width — mirror both steps exactly
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        w = bytes([k])
        if next_code == _MAX_CODES:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            code_size = min_code_size + 1
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walking
# ---------------------------------------------------------------------------

def _sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data sub-block sequence starting at ``pos``;
    returns (data, position after the 0x00 terminator)."""
    parts = []
    n = len(blob)
    while True:
        if pos >= n:
            raise GifError("sub-block sequence truncated")
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > n:
            raise GifError("sub-block overruns the payload")
        parts.append(blob[pos : pos + size])
        pos += size


def _color_table(blob: bytes, pos: int, packed: int) -> tuple[np.ndarray | None, int]:
    """Read a color table if the descriptor's packed byte says one
    follows: bit 7 = presence, bits 0-2 = size n → 2**(n+1) entries."""
    if not packed & 0x80:
        return None, pos
    count = 2 << (packed & 0x07)
    end = pos + 3 * count
    if end > len(blob):
        raise GifError("color table overruns the payload")
    return (
        np.frombuffer(blob[pos:end], dtype=np.uint8).reshape(count, 3),
        end,
    )


def _iter_frames(blob: bytes):
    """Yield (left, top, indices (h, w) uint8, palette, transparent_idx,
    disposal) per image descriptor, plus the canvas via .send-free
    closure — used by both the frame compositor and the counter."""
    if blob[:6] not in GIF_SIGS:
        raise GifError("not a GIF (bad signature)")
    if len(blob) < 13:
        raise GifError("GIF truncated before the screen descriptor")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    if width == 0 or height == 0:
        raise GifError("GIF with zero canvas dimension")
    global_pal, pos = _color_table(blob, 13, packed)
    yield (width, height)  # screen first
    transparent = None
    disposal = 0
    n = len(blob)
    while pos < n:
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= n:
                raise GifError("extension truncated")
            label = blob[pos]
            pos += 1
            data, pos = _sub_blocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise GifError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise GifError("image descriptor truncated")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > width or top + h > height:
            raise GifError("image descriptor outside the canvas")
        local_pal, pos = _color_table(blob, pos, ipacked)
        pal = local_pal if local_pal is not None else global_pal
        if pal is None:
            raise GifError("GIF image with no color table")
        if pos >= n:
            raise GifError("missing LZW min code size")
        mcs = blob[pos]
        pos += 1
        data, pos = _sub_blocks(blob, pos)
        idx = lzw_decode(data, mcs, w * h).reshape(h, w)
        if int(idx.max()) >= len(pal):
            raise GifError("color index past the palette")
        if ipacked & 0x40:  # interlaced: un-shuffle the rows
            un = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, h, step)
                un[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = un
        yield (left, top, idx, pal, transparent, disposal)
        transparent = None
        disposal = 0
    raise GifError("GIF ended without a trailer")


# ---------------------------------------------------------------------------
# public decode surface
# ---------------------------------------------------------------------------

def decode_gif_frames(blob: bytes) -> list[np.ndarray]:
    """All frames composited onto the logical canvas → list of
    (H, W, 4) uint8 RGBA arrays. The canvas starts fully transparent;
    disposal methods 0/1 (keep), 2 (clear subrect) and 3 (restore
    previous) apply between frames, and transparent-index pixels leave
    the underlying canvas untouched."""
    it = _iter_frames(blob)
    width, height = next(it)
    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    frames = []
    for left, top, idx, pal, transparent, disposal in it:
        h, w = idx.shape
        region = canvas[top : top + h, left : left + w]
        before = region.copy() if disposal == 3 else None
        rgba = np.concatenate(
            [pal[idx], np.full((h, w, 1), 255, dtype=np.uint8)], axis=-1
        )
        if transparent is not None:
            keep = (idx == transparent)[:, :, None]
            rgba = np.where(keep, region, rgba)
        region[:] = rgba
        frames.append(canvas.copy())
        if disposal == 2:
            region[:] = 0
        elif disposal == 3:
            region[:] = before
    if not frames:
        raise GifError("GIF contains no image")
    return frames


def decode_gif(blob: bytes) -> np.ndarray:
    """First frame composited on the canvas → (H, W, 3) uint8 when it
    is fully opaque, else (H, W, 4) RGBA — mirroring how
    ``decode_png`` returns RGB unless transparency is present."""
    it = _iter_frames(blob)
    width, height = next(it)
    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    for left, top, idx, pal, transparent, _disposal in it:
        h, w = idx.shape
        region = canvas[top : top + h, left : left + w]
        rgba = np.concatenate(
            [pal[idx], np.full((h, w, 1), 255, dtype=np.uint8)], axis=-1
        )
        if transparent is not None:
            keep = (idx == transparent)[:, :, None]
            rgba = np.where(keep, region, rgba)
        region[:] = rgba
        break
    else:
        raise GifError("GIF contains no image")
    if bool((canvas[:, :, 3] == 255).all()):
        return canvas[:, :, :3].copy()
    return canvas


def gif_frame_count(blob: bytes) -> int:
    """Number of image descriptors (animation frames)."""
    it = _iter_frames(blob)
    next(it)
    return sum(1 for _ in it)


def parse_gif_header(blob: bytes) -> tuple[int, int, int] | None:
    """(canvas_width, canvas_height, 3) from the logical screen
    descriptor, or None if the blob is not a GIF prefix — the cheap
    header-only sibling of :func:`decode_gif`, matching the
    ``media_headers.parse_*_header`` contract."""
    if len(blob) < 13 or blob[:6] not in GIF_SIGS:
        return None
    width, height = struct.unpack_from("<HH", blob, 6)
    if width == 0 or height == 0:
        return None
    return int(width), int(height), 3


# ---------------------------------------------------------------------------
# deterministic fixtures (tests + scale synthesis)
# ---------------------------------------------------------------------------

def fixture_gif_palette(i: int) -> np.ndarray:
    """Deterministic (16, 3) uint8 palette for id ``i`` — integer
    hash, platform-stable (same philosophy as
    ``media_decode.fixture_pixels``)."""
    k = np.arange(16 * 3, dtype=np.int64)
    return ((k * 2246822519 + i * 2654435761 + 7) % 251).astype(
        np.uint8
    ).reshape(16, 3)


def fixture_gif_indices(i: int, max_side: int = 24) -> np.ndarray:
    """Deterministic (h, w) uint8 index plane in [0, 16) for id ``i``."""
    h = 2 + i % max_side
    w = 2 + (i * 5) % max_side
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((yy * 31 + xx * 17 + (yy * xx + 3) * (i * 2654435761 % 1024))
            % 16).astype(np.uint8)


def synth_gif_pixels(i: int) -> bytes:
    """id → complete GIF89a carrying real LZW-compressed pixels. The
    FIRST frame is always a full-canvas opaque plane, so the expected
    composite is the closed form ``fixture_gif_palette(i)[
    fixture_gif_indices(i)]``; ids cycle interlacing and append a
    second subrect frame (with transparency) every third id to keep
    the animation paths exercised."""
    idx = fixture_gif_indices(i)
    h, w = idx.shape
    frames = [{"indices": idx, "interlace": bool(i % 2)}]
    if i % 3 == 0 and h >= 3 and w >= 3:
        sub = fixture_gif_indices(i + 1)[: h - 1, : w - 1]
        frames.append(
            {"indices": sub, "left": 1, "top": 1,
             "transparent": int(sub[0, 0]), "disposal": 2}
        )
    return encode_gif((w, h), frames, fixture_gif_palette(i))


# ---------------------------------------------------------------------------
# encoder (fixtures / round-trip tests)
# ---------------------------------------------------------------------------

def encode_gif(
    canvas: tuple[int, int],
    frames: list[dict],
    palette: np.ndarray,
) -> bytes:
    """Assemble a valid GIF89a. ``canvas`` is (width, height);
    ``palette`` is (N≤256, 3) uint8 (padded to a power of two); each
    frame dict has ``indices`` ((h, w) uint8) and optional ``left``,
    ``top``, ``transparent`` (index or None), ``disposal`` (0-3),
    ``interlace`` (bool), ``local_palette`` ((M, 3) or None)."""
    width, height = canvas
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)

    def padded(p: np.ndarray) -> tuple[bytes, int]:
        count = max(2, 1 << int(np.ceil(np.log2(len(p)))))
        out = np.zeros((count, 3), dtype=np.uint8)
        out[: len(p)] = p
        return out.tobytes(), count.bit_length() - 2  # size field n

    gct, gct_n = padded(pal)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | gct_n, 0, 0)
    out += gct
    for frame in frames:
        idx = np.asarray(frame["indices"], dtype=np.uint8)
        h, w = idx.shape
        left = frame.get("left", 0)
        top = frame.get("top", 0)
        transparent = frame.get("transparent")
        disposal = frame.get("disposal", 0)
        if transparent is not None or disposal:
            flags = (disposal & 0x07) << 2 | (transparent is not None)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, transparent or 0, 0])
        local = frame.get("local_palette")
        ipacked = 0x40 if frame.get("interlace") else 0
        lct = b""
        n_colors = len(pal)
        if local is not None:
            lct, lct_n = padded(np.asarray(local, dtype=np.uint8).reshape(-1, 3))
            ipacked |= 0x80 | lct_n
            n_colors = len(local)
        out += bytes([0x2C]) + struct.pack("<HHHHB", left, top, w, h, ipacked)
        out += lct
        if frame.get("interlace"):
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        mcs = max(2, (max(int(idx.max()), n_colors - 1)).bit_length())
        out += bytes([mcs])
        z = lzw_encode(idx.reshape(-1), mcs)
        for i in range(0, len(z), 255):
            part = z[i : i + 255]
            out += bytes([len(part)]) + part
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
