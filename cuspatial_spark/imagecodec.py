"""Dependency-free image codec: netpbm (PGM/PPM), uncompressed BMP,
and PNG (via stdlib zlib).

This is the REAL decode step behind ``multimodal.image_features`` —
no PIL/libjpeg in this environment, so the supported formats are the
ones decodable from first principles with numpy + zlib:

- **netpbm** P5 (8-bit grayscale) / P6 (8-bit RGB), binary rasters,
  ``#`` comments, maxval <= 255.
- **BMP** BITMAPINFOHEADER, uncompressed (BI_RGB): 24-bit BGR and
  8-bit paletted, bottom-up or top-down, 4-byte row padding.
- **PNG** bit depth 8, color type 0 (gray) or 2 (RGB), interlace 0,
  all five scanline filters (None/Sub/Up/Average/Paeth).

Encoders for the same formats exist so fixtures/benchmarks can build
real byte streams; decode(encode(px)) == px is the round-trip
contract (tests/test_pipeline_ops.py::TestImageCodec).

Everything here is driver/executor-side plain Python+numpy — the
distributed story (Arrow batching, partitioning, schema) lives in
multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    """Payload is not a decodable image in a supported format."""


# ------------------------------------------------------------- netpbm


def _pnm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset_past_last_ws)."""
    toks: list[int] = []
    i = 2  # past magic
    cur = b""
    while i < len(buf) and len(toks) < n:
        ch = buf[i : i + 1]
        if ch == b"#":
            while i < len(buf) and buf[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif ch in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
            i += 1
            if len(toks) == n:
                return toks, i
        elif ch.isdigit():
            cur += ch
            i += 1
        else:
            raise ImageDecodeError(f"bad netpbm header byte {ch!r}")
    raise ImageDecodeError("truncated netpbm header")


def decode_pnm(payload: bytes) -> tuple[str, np.ndarray]:
    magic = payload[:2]
    if magic == b"P5":
        channels, fmt = 1, "pgm"
    elif magic == b"P6":
        channels, fmt = 3, "ppm"
    else:
        raise ImageDecodeError("not a binary netpbm payload")
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if w <= 0 or h <= 0:
        raise ImageDecodeError(f"invalid netpbm dimensions {w}x{h}")
    if maxval > 255:
        raise ImageDecodeError("16-bit netpbm not supported")
    n = w * h * channels
    raster = payload[off : off + n]
    if len(raster) < n:
        raise ImageDecodeError("truncated netpbm raster")
    px = np.frombuffer(raster, np.uint8).reshape(h, w, channels)
    return fmt, px


def encode_pnm(px: np.ndarray) -> bytes:
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    magic = {1: b"P5", 3: b"P6"}[c]
    return magic + f"\n{w} {h}\n255\n".encode() + px.tobytes()


# ---------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> tuple[str, np.ndarray]:
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ImageDecodeError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ImageDecodeError("pre-BITMAPINFOHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ImageDecodeError("compressed BMP not supported")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ImageDecodeError(f"invalid BMP dimensions {w}x{h}")
    stride = (w * (bpp // 8) + 3) & ~3
    raster = payload[data_off : data_off + stride * h]
    if len(raster) < stride * h:
        raise ImageDecodeError("truncated BMP raster")
    rows = np.frombuffer(raster, np.uint8).reshape(h, stride)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return "bmp", np.ascontiguousarray(px)
    if bpp == 8:
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        idx = rows[:, :w]
        px = pal[idx]  # (h, w, 3)
        if (px[:, :, 0] == px[:, :, 1]).all() and (px[:, :, 1] == px[:, :, 2]).all():
            return "bmp", np.ascontiguousarray(px[:, :, :1])  # gray palette
        return "bmp", np.ascontiguousarray(px)
    raise ImageDecodeError(f"{bpp}-bit BMP not supported")


def encode_bmp(px: np.ndarray) -> bytes:
    """24-bit for RGB input, 8-bit gray-paletted for single-channel."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c == 3:
        bpp, palette = 24, b""
        rows = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    elif c == 1:
        bpp = 8
        palette = b"".join(struct.pack("<BBBB", v, v, v, 0) for v in range(256))
        rows = px.reshape(h, w)
    else:
        raise ValueError("BMP encoder supports 1 or 3 channels")
    stride = (w * (bpp // 8) + 3) & ~3
    padded = np.zeros((h, stride), np.uint8)
    padded[:, : rows.shape[1]] = rows
    raster = padded[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + len(palette)
    file_size = data_off + len(raster)
    hdr = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raster), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    return hdr + dib + palette + raster


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Vectorized scanline unfiltering: None/Up are whole-row ops,
    Sub is a per-channel-lane prefix sum (mod distributes over the
    cumulative sum), and Average/Paeth — whose left-dependency is
    inherently sequential — loop over pixel COLUMNS with all ``c``
    channel lanes vectorized per step (w iterations/row, not w*c)."""
    stride = w * c
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    pos = 0
    for r in range(h):
        ft = raw[pos]
        pos += 1
        cur = np.frombuffer(raw[pos : pos + stride], np.uint8).astype(np.int64)
        pos += stride
        if ft == 0:
            line = cur
        elif ft == 1:  # Sub: out[i] = cumsum over its channel lane mod 256
            line = np.empty(stride, np.int64)
            for lane in range(c):
                line[lane::c] = np.cumsum(cur[lane::c]) & 0xFF
        elif ft == 2:  # Up
            line = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            line = np.empty(stride, np.int64)
            left = np.zeros(c, np.int64)
            for x in range(w):
                sl = slice(x * c, (x + 1) * c)
                left = (cur[sl] + ((left + prev[sl]) >> 1)) & 0xFF
                line[sl] = left
        elif ft == 4:  # Paeth
            line = np.empty(stride, np.int64)
            left = np.zeros(c, np.int64)
            ul = np.zeros(c, np.int64)
            for x in range(w):
                sl = slice(x * c, (x + 1) * c)
                up = prev[sl]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (cur[sl] + pred) & 0xFF
                line[sl] = left
                ul = up
        else:
            raise ImageDecodeError(f"unknown PNG filter {ft}")
        out[r] = line
        prev = line
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> tuple[str, np.ndarray]:
    if payload[:8] != _PNG_SIG:
        raise ImageDecodeError("not a PNG payload")
    pos = 8
    w = h = None
    channels = 0
    idat = b""
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ImageDecodeError(f"PNG bit depth {depth} not supported")
            if color == 0:
                channels = 1
            elif color == 2:
                channels = 3
            else:
                raise ImageDecodeError(f"PNG color type {color} not supported")
            if interlace != 0:
                raise ImageDecodeError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ImageDecodeError("PNG missing IHDR/IDAT")
    if w <= 0 or h <= 0:
        raise ImageDecodeError(f"invalid PNG dimensions {w}x{h}")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ImageDecodeError(f"PNG inflate failed: {e}") from e
    if len(raw) != h * (1 + w * channels):
        raise ImageDecodeError("PNG raster size mismatch")
    return "png", _png_unfilter(raw, h, w, channels)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 3: 2}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


# ----------------------------------------------------------- dispatch


def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """(format, pixels) with pixels shaped (h, w, channels) uint8.
    Raises ImageDecodeError for unsupported/undecodable payloads —
    including malformed containers that pass the magic-byte check
    (truncated headers, corrupt palettes/rasters): every low-level
    parse failure is normalized to ImageDecodeError so callers can
    degrade per-row instead of failing the task."""
    if not payload:
        raise ImageDecodeError("cannot decode empty payload")
    head = payload[:8]
    try:
        if head[:2] in (b"P5", b"P6"):
            fmt, px = decode_pnm(payload)
        elif head[:2] == b"BM":
            fmt, px = decode_bmp(payload)
        elif head == _PNG_SIG:
            fmt, px = decode_png(payload)
        else:
            raise ImageDecodeError("unrecognized image format")
    except ImageDecodeError:
        raise
    except (struct.error, IndexError, ValueError, OverflowError, MemoryError) as e:
        raise ImageDecodeError(f"malformed image container: {e}") from e
    h, w = px.shape[:2]
    if h <= 0 or w <= 0:
        raise ImageDecodeError(f"degenerate image dimensions {w}x{h}")
    return fmt, px


def average_hash(px: np.ndarray, grid: int = 8) -> int:
    """64-bit average hash: gray -> ``grid x grid`` EXACT block means
    (every pixel contributes to exactly one cell, via add.reduceat
    over integer bin edges — same downsampling as image_thumbnail) ->
    bit per cell above the mean of the cells.  Images smaller than
    the grid repeat edge blocks."""
    if px.ndim == 3:
        gray = px.astype(np.float64).mean(axis=2)
    else:
        gray = px.astype(np.float64)
    h, w = gray.shape
    g_r, g_c = min(grid, h), min(grid, w)
    r_edges = (np.arange(g_r) * h) // g_r
    c_edges = (np.arange(g_c) * w) // g_c
    cells = np.add.reduceat(np.add.reduceat(gray, c_edges, axis=1), r_edges, axis=0)
    cells = cells / np.outer(
        np.diff(np.append(r_edges, h)), np.diff(np.append(c_edges, w))
    )
    if g_r < grid or g_c < grid:
        cells = cells[
            np.minimum(np.arange(grid), g_r - 1)[:, None],
            np.minimum(np.arange(grid), g_c - 1)[None, :],
        ]
    bits = (cells > cells.mean()).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out
