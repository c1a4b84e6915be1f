"""Dependency-free WAV (RIFF/WAVE) codec: stdlib struct + numpy only.

The audio leg of the multimodal column story (the reference engine,
rapidsai/cuspatial, has no audio surface — this extends the
training-data-pipeline side of the repo the same way imagecodec.py
does for images): no soundfile/librosa exists in this environment, so
PCM WAV is parsed from first principles.  The RIFF chunk walk accepts
arbitrary chunk order, unknown chunks (LIST/INFO/fact/cue), and
word-aligned padding; sample formats are unsigned 8-bit, signed
16/24/32-bit PCM and IEEE float32/64, any channel count, including
WAVE_FORMAT_EXTENSIBLE headers.

Every malformed-container failure — truncated chunks, short headers,
absurd field values, partial trailing frames — is normalized to
``AudioDecodeError`` so callers (``multimodal.audio_features``) can
degrade per-row instead of failing the task.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    """Payload is not decodable WAV audio."""


def _chunks(payload: bytes):
    """Yield ``(chunk_id, chunk_data)`` for each RIFF subchunk."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise AudioDecodeError(f"truncated chunk {cid!r}")
        yield cid, data
        pos += 8 + size + (size & 1)  # subchunks are word-aligned


def _parse_fmt(chunk: bytes) -> tuple[int, int, int, int]:
    if len(chunk) < 16:
        raise AudioDecodeError("short fmt chunk")
    audio_format, channels, rate, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", chunk, 0
    )
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        if len(chunk) < 26:
            raise AudioDecodeError("short extensible fmt chunk")
        (audio_format,) = struct.unpack_from("<H", chunk, 24)
    if channels < 1 or channels > 1024:
        raise AudioDecodeError(f"invalid channel count {channels}")
    if rate < 1:
        raise AudioDecodeError(f"invalid sample rate {rate}")
    return audio_format, channels, rate, bits


def _decode_pcm(data: bytes, bits: int) -> np.ndarray:
    if bits == 8:  # unsigned, centered at 128
        return np.frombuffer(data, np.uint8).astype(np.int16) - 128
    if bits == 16:
        return np.frombuffer(data, "<i2").astype(np.int32)
    if bits == 24:
        raw = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int64)
        val = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        return ((val ^ 0x800000) - 0x800000).astype(np.int32)
    if bits == 32:
        return np.frombuffer(data, "<i4").astype(np.int64)
    raise AudioDecodeError(f"unsupported PCM bit depth {bits}")


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """``(sample_rate, samples)`` with samples shaped
    ``(n_frames, channels)``: centered integers for PCM (8-bit is
    re-centered at 128 so silence is 0 in every depth), float64 for
    IEEE-float payloads.  Raises AudioDecodeError for unsupported or
    undecodable payloads."""
    if not payload:
        raise AudioDecodeError("cannot decode empty payload")
    try:
        fmt = data = None
        for cid, chunk in _chunks(bytes(payload)):
            if cid == b"fmt " and fmt is None:
                fmt = _parse_fmt(chunk)
            elif cid == b"data" and data is None:
                data = chunk
        if fmt is None or data is None:
            raise AudioDecodeError("WAV missing fmt/data chunk")
        audio_format, channels, rate, bits = fmt
        if audio_format == 1:
            flat = _decode_pcm(data, bits)
        elif audio_format == 3:
            if bits == 32:
                flat = np.frombuffer(data, "<f4").astype(np.float64)
            elif bits == 64:
                flat = np.frombuffer(data, "<f8")
            else:
                raise AudioDecodeError(f"unsupported float bit depth {bits}")
        else:
            raise AudioDecodeError(f"unsupported WAV format code {audio_format}")
        frame_bytes = channels * (bits // 8)
        if frame_bytes == 0 or len(data) % frame_bytes:
            raise AudioDecodeError(
                f"data length {len(data)} not a whole number of "
                f"{frame_bytes}-byte frames"
            )
    except AudioDecodeError:
        raise
    except (struct.error, IndexError, ValueError, OverflowError, MemoryError) as e:
        raise AudioDecodeError(f"malformed WAV container: {e}") from e
    return rate, flat.reshape(-1, channels)


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Encode ``(n_frames, channels)`` integer samples as PCM WAV
    (8- or 16-bit).  ``extra_chunks`` are inserted between ``fmt `` and
    ``data`` — the fixture side of chunk-walk testing."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if bits == 16:
        raw = samples.astype("<i2").tobytes()
    elif bits == 8:  # store centered values back as unsigned
        raw = (samples.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise AudioDecodeError(f"encode supports 8/16-bit PCM, not {bits}")
    balign = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * balign, balign, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, data in extra_chunks or ():
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_stats(samples: np.ndarray) -> dict:
    """Deterministic per-clip features over decoded frames.

    All sums run in exact integer-valued float64 space (|s| <= 2^31,
    counts bounded by batch contract), so means/rms are bit-identical
    to a SQL re-derivation: mean = exact_sum / n, rms =
    sqrt(exact_sq_sum / n), and zero crossings count strict sign flips
    between successive frames per channel lane."""
    flat = samples.astype(np.float64).ravel()
    n = flat.size
    if n == 0:
        raise AudioDecodeError("empty audio stream")
    sq = flat * flat
    crossings = int(
        np.count_nonzero(
            samples[:-1].astype(np.float64) * samples[1:].astype(np.float64) < 0
        )
    )
    return {
        "amp_mean": float(flat.sum() / n),
        "amp_min": float(flat.min()),
        "amp_max": float(flat.max()),
        "rms": float(np.sqrt(sq.sum() / n)),
        "zero_crossings": crossings,
    }
