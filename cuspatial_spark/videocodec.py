"""Dependency-free video codecs: YUV4MPEG2 (Y4M) and uncompressed
RIFF/AVI, stdlib struct + numpy only.

The video leg of the multimodal column story (the reference engine,
rapidsai/cuspatial, has no video surface — this extends the
training-data-pipeline side of the repo the same way imagecodec.py
and audiocodec.py do for images and audio): no pyav/ffmpeg exists in
this environment, so the two uncompressed container formats every
toolchain can emit (``ffmpeg -pix_fmt yuv444p out.y4m``, ``ffmpeg
-vcodec rawvideo out.avi``) are parsed from first principles.

* **Y4M** (YUV4MPEG2): plain-text stream header (``W``/``H``/``F``
  fps ratio/``C`` colourspace tags) followed by ``FRAME`` records of
  raw planar samples.  ``C444`` (full-resolution 3-plane), ``C420``
  family (half-resolution chroma, nearest-upsampled on decode) and
  ``Cmono`` are supported.
* **AVI** (RIFF ``AVI ``): ``hdrl`` header list (``avih`` +
  ``strl``/``strh``/``strf`` with a BITMAPINFOHEADER), ``movi`` list
  of ``00db`` raw-DIB frames — bottom-up BGR24 rows padded to 4-byte
  boundaries, exactly the BMP raster layout.

Compressed codecs (H.264 et al.) are out of scope by design — a
production deployment swaps ``decode_video`` for a pyav call; every
Spark-side shape (mapInPandas batching, 1:N frame fan-out, feature
schema) is identical either way.

Every malformed-container failure is normalized to
``VideoDecodeError`` so callers (``multimodal.video_features``) can
degrade per-row instead of failing the task.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoDecodeError(ValueError):
    """Payload is not decodable video."""


# ---------------------------------------------------------------- Y4M

_Y4M_MAGIC = b"YUV4MPEG2"


def decode_y4m(payload: bytes) -> tuple[float, np.ndarray]:
    """Decode a YUV4MPEG2 stream -> ``(fps, frames)`` where frames is
    uint8 with shape (n_frames, height, width, channels); channels is
    1 for ``Cmono`` and 3 (Y, Cb, Cr planes, NOT RGB-converted — the
    codec reports stored samples exactly) otherwise."""
    nl = payload.find(b"\n")
    if not payload.startswith(_Y4M_MAGIC) or nl < 0:
        raise VideoDecodeError("not a YUV4MPEG2 payload")
    width = height = 0
    fps_num, fps_den = 30, 1
    cspace = "420"
    for tag in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        try:
            if key == b"W":
                width = int(val)
            elif key == b"H":
                height = int(val)
            elif key == b"F":
                num, den = val.split(b":")
                fps_num, fps_den = int(num), int(den)
            elif key == b"C":
                cspace = val.decode("ascii")
        except (ValueError, UnicodeDecodeError) as exc:
            raise VideoDecodeError(f"bad Y4M header tag {tag!r}") from exc
    if width <= 0 or height <= 0 or fps_num <= 0 or fps_den <= 0:
        raise VideoDecodeError("bad Y4M geometry/rate")
    if cspace.startswith("mono"):
        plane_sizes = [(height, width)]
    elif cspace.startswith("444"):
        plane_sizes = [(height, width)] * 3
    elif cspace.startswith("420"):
        if width % 2 or height % 2:
            raise VideoDecodeError("C420 requires even dimensions")
        half = (height // 2, width // 2)
        plane_sizes = [(height, width), half, half]
    else:
        raise VideoDecodeError(f"unsupported Y4M colourspace C{cspace}")
    frame_bytes = sum(h * w for h, w in plane_sizes)

    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if not payload.startswith(b"FRAME", pos) or fnl < 0:
            raise VideoDecodeError("bad FRAME record")
        pos = fnl + 1
        if pos + frame_bytes > n:
            raise VideoDecodeError("truncated frame payload")
        planes = []
        for ph, pw in plane_sizes:
            planes.append(
                np.frombuffer(payload, np.uint8, ph * pw, pos).reshape(ph, pw)
            )
            pos += ph * pw
        if len(planes) == 1:
            frames.append(planes[0][:, :, None])
        else:
            ups = [
                p.repeat(height // p.shape[0], axis=0).repeat(
                    width // p.shape[1], axis=1
                )
                for p in planes
            ]
            frames.append(np.stack(ups, axis=2))
    if not frames:
        raise VideoDecodeError("no frames")
    return fps_num / fps_den, np.stack(frames)


def encode_y4m(
    frames: np.ndarray, fps_num: int = 25, fps_den: int = 1
) -> bytes:
    """Encode uint8 frames (n, h, w, c) with c in {1, 3} as Y4M
    ``Cmono`` / ``C444`` — full-resolution planes, lossless."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    cs = b"mono" if c == 1 else b"444"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n" % (w, h, fps_num, fps_den, cs)]
    for f in range(n):
        out.append(b"FRAME\n")
        for ch in range(c):
            out.append(frames[f, :, :, ch].tobytes())
    return b"".join(out)


# ---------------------------------------------------------------- AVI


def _riff_lists(payload: bytes, pos: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for chunks in [pos, end)."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise VideoDecodeError(f"truncated chunk {cid!r}")
        yield cid, body, body + size
        pos = body + size + (size & 1)


def _find_list(payload: bytes, pos: int, end: int, name: bytes) -> tuple[int, int]:
    for cid, b, e in _riff_lists(payload, pos, end):
        if cid == b"LIST" and payload[b : b + 4] == name:
            return b + 4, e
    raise VideoDecodeError(f"missing LIST {name!r}")


def decode_avi(payload: bytes) -> tuple[float, np.ndarray]:
    """Decode an uncompressed (``biCompression == 0``) RIFF/AVI ->
    ``(fps, frames)`` with frames uint8 (n, h, w, c), RGB order for
    24-bit DIBs, single-channel for 8-bit."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise VideoDecodeError("not a RIFF/AVI payload")
    top = 12
    hdrl_b, hdrl_e = _find_list(payload, top, len(payload), b"hdrl")
    avih = next(
        (b for cid, b, e in _riff_lists(payload, hdrl_b, hdrl_e) if cid == b"avih"),
        None,
    )
    if avih is None or avih + 40 > hdrl_e:
        raise VideoDecodeError("missing avih header")
    (usec_pf,) = struct.unpack_from("<I", payload, avih)
    if usec_pf == 0:
        raise VideoDecodeError("zero frame period")
    strl_b, strl_e = _find_list(payload, hdrl_b, hdrl_e, b"strl")
    strf = None
    for cid, b, e in _riff_lists(payload, strl_b, strl_e):
        if cid == b"strh" and payload[b : b + 4] != b"vids":
            raise VideoDecodeError("first stream is not video")
        if cid == b"strf":
            strf = b
    if strf is None or strf + 40 > strl_e:
        raise VideoDecodeError("missing strf BITMAPINFOHEADER")
    _, w, h, _, bits, comp = struct.unpack_from("<IiiHHI", payload, strf)
    if comp != 0:
        raise VideoDecodeError(f"compressed AVI (biCompression={comp}) unsupported")
    if bits not in (8, 24) or w <= 0 or h == 0:
        raise VideoDecodeError(f"unsupported DIB ({bits}-bit, {w}x{h})")
    bottom_up = h > 0
    h = abs(h)
    c = 1 if bits == 8 else 3
    stride = (w * c + 3) & ~3

    movi_b, movi_e = _find_list(payload, top, len(payload), b"movi")
    frames = []
    for cid, b, e in _riff_lists(payload, movi_b, movi_e):
        if cid[2:4] not in (b"db", b"dc"):
            continue
        if e - b < stride * h:
            raise VideoDecodeError("truncated frame DIB")
        rows = np.frombuffer(payload, np.uint8, stride * h, b).reshape(h, stride)
        px = rows[:, : w * c].reshape(h, w, c)
        if bottom_up:
            px = px[::-1]
        if c == 3:
            px = px[:, :, ::-1]  # stored BGR -> RGB
        frames.append(px)
    if not frames:
        raise VideoDecodeError("no frames")
    return 1e6 / usec_pf, np.stack(frames)


def encode_avi(frames: np.ndarray, fps: float = 25.0) -> bytes:
    """Encode uint8 frames (n, h, w, c), c in {1, 3}, as uncompressed
    AVI (raw bottom-up DIB ``00db`` records, BGR for 3-channel) —
    lossless.  ``fps`` must divide 1e6 to an integer frame period."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    usec_pf = round(1e6 / fps)
    bits = 8 * c
    stride = (w * c + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))

    def lst(name: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", name + body)

    frame_size = stride * h
    avih = struct.pack(
        "<14I", usec_pf, frame_size * int(fps), 0, 0, n, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, usec_pf, 1000000,
        0, n, frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, frame_size, 0, 0, 0, 0)
    if c == 1:  # 8-bit DIBs need a palette: identity grayscale
        strf += b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    recs = []
    pad = np.zeros((h, stride - w * c), dtype=np.uint8)
    for f in range(n):
        px = frames[f]
        if c == 3:
            px = px[:, :, ::-1]
        rows = np.hstack([px.reshape(h, w * c), pad])[::-1]  # bottom-up
        recs.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(recs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


# ------------------------------------------------------------- driver


def decode_video(payload: bytes) -> tuple[str, float, np.ndarray]:
    """Sniff + decode -> ``(format, fps, frames)``; frames is uint8
    (n_frames, height, width, channels)."""
    if payload[:9] == _Y4M_MAGIC:
        fps, frames = decode_y4m(payload)
        return "y4m", fps, frames
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        fps, frames = decode_avi(payload)
        return "avi", fps, frames
    raise VideoDecodeError("unrecognized video container")


def video_stats(frames: np.ndarray) -> dict:
    """Exact whole-clip pixel stats + motion energy.  ``motion_mean``
    is the mean absolute difference between temporally adjacent
    samples over the whole clip (one exact integer sum, one float
    division — bit-reproducible anywhere); 0.0 for single-frame
    clips."""
    flat = frames.astype(np.int64)
    if frames.shape[0] > 1:
        d = np.abs(flat[1:] - flat[:-1])
        motion = float(d.sum() / d.size)
    else:
        motion = 0.0
    return {
        "px_mean": float(flat.sum() / flat.size),
        "px_min": int(flat.min()),
        "px_max": int(flat.max()),
        "motion_mean": motion,
    }
