"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata
struct.  The IMAGE path is REAL: ``imagecodec.decode_image`` decodes
netpbm/BMP/PNG from first principles (numpy + stdlib zlib — no
PIL/libjpeg in this environment), and ``image_features`` /
``decode_features`` run it Arrow-batched over ``mapInPandas``.  The
AUDIO path is REAL too: ``audiocodec.decode_wav`` parses RIFF/WAVE
PCM (8/16/24/32-bit + IEEE float) with stdlib struct + numpy, and
``audio_features`` featurizes decoded frames (rate, duration, rms,
zero crossings).  The VIDEO path is REAL for uncompressed containers:
``videocodec.decode_video`` parses YUV4MPEG2 (mono/444/420) and raw-DIB
RIFF/AVI streams frame-exactly; compressed codecs (H.264 et al.) stay
out of scope — swap ``decode_video`` for pyav in production, every
Spark-side shape (mapInPandas batching, 1:N frame fan-out,
partitioning) is identical either way.  ``_decode_stub`` remains only
as the degrade-to-bytes fallback for unrecognized payloads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"<htm", "html"),
    (b"<!do", "html"),
    (b"P5", "pgm"),
    (b"P6", "ppm"),
    (b"BM", "bmp"),
]


def binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Size, md5 and magic-byte format guess — pure built-ins."""
    b = F.col(bin_col)
    fmt = F.lit("unknown")
    for magic, name in reversed(_MAGIC):
        prefix = F.substring(b, 1, len(magic))
        fmt = F.when(prefix == F.lit(magic), F.lit(name)).otherwise(fmt)
    return (
        df.withColumn("payload_bytes", F.octet_length(b).cast("long"))
        .withColumn("payload_md5", F.md5(b))
        .withColumn("payload_format", fmt)
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("payload_md5", StringType(), False),
        StructField("feat_mean", DoubleType(), False),
        StructField("feat_std", DoubleType(), False),
        StructField("feat_hist", ArrayType(LongType(), False), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB: stands in for a real codec (PIL.Image.open / soundfile /
    pyav frame sampling).  Deterministic: interprets the raw bytes as a
    uint8 'pixel' array.  Raises like a real decoder would on empty
    input."""
    if not payload:
        raise ValueError("cannot decode empty payload")
    return np.frombuffer(payload, dtype=np.uint8)


FRAME_SCHEMA = StructType(
    [
        StructField("payload_md5", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_mean", DoubleType(), False),
        StructField("frame_bytes", LongType(), False),
    ]
)


def sample_frames(
    df: DataFrame, bin_col: str = "payload", n_frames: int = 4
) -> DataFrame:
    """Frame sampling plumbing: one input payload -> up to ``n_frames``
    output rows (the 1:N mapInPandas shape a real pyav frame sampler
    needs).  STUB codec: the payload is split into equal byte spans
    standing in for decoded frames."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[bin_col]:
                raw = _decode_stub(bytes(payload))
                md5 = hashlib.md5(bytes(payload)).hexdigest()
                spans = np.array_split(raw, min(n_frames, len(raw)))
                for i, fr in enumerate(spans):
                    rows.append((md5, i, float(fr.mean()), int(fr.size)))
            yield pd.DataFrame(
                rows, columns=["payload_md5", "frame_idx", "frame_mean", "frame_bytes"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


THUMB_SCHEMA = StructType(
    [
        StructField("payload_md5", StringType(), False),
        StructField("thumb", ArrayType(DoubleType(), False), False),
    ]
)


def resize_features(
    df: DataFrame, bin_col: str = "payload", size: int = 16
) -> DataFrame:
    """Resize plumbing: decode -> fixed-length vector (the
    embedding-shaped output a real thumbnailer produces).  STUB codec:
    linear interpolation of the byte 'signal' onto ``size`` samples —
    deterministic, length-invariant."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[bin_col]:
                arr = _decode_stub(bytes(payload)).astype(np.float64)
                grid = np.linspace(0.0, len(arr) - 1.0, size)
                thumb = np.interp(grid, np.arange(len(arr)), arr)
                rows.append(
                    (hashlib.md5(bytes(payload)).hexdigest(), list(thumb))
                )
            yield pd.DataFrame(rows, columns=["payload_md5", "thumb"])

    return df.mapInPandas(run, schema=THUMB_SCHEMA)


def decode_features(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: one
    mapInPandas pass, NumPy math per batch (no per-row Python beyond
    the codec boundary itself, which is per-item in any real decoder).

    Image payloads (netpbm/BMP/PNG) are REALLY decoded
    (imagecodec.decode_image) and featurized over their pixels;
    unrecognized payloads degrade to the raw byte-signal
    interpretation so mixed binary columns stay end-to-end usable."""
    import hashlib

    from .imagecodec import ImageDecodeError, decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[bin_col]:
                raw = bytes(payload)
                try:
                    _, px = decode_image(raw)
                    arr = px.ravel()
                except ImageDecodeError:
                    arr = _decode_stub(raw)
                hist = np.bincount(arr >> 5, minlength=8).astype(np.int64)
                rows.append(
                    (
                        hashlib.md5(raw).hexdigest(),
                        float(arr.mean()),
                        float(arr.std()),
                        list(hist),
                        int(arr.size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["payload_md5", "feat_mean", "feat_std", "feat_hist", "n_bytes"]
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = StructType(
    [
        StructField("image_format", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("px_mean", DoubleType(), False),
        StructField("px_min", LongType(), False),
        StructField("px_max", LongType(), False),
        StructField("phash", StringType(), False),
    ]
)


def image_features(
    df: DataFrame, bin_col: str = "payload", id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """REAL image decode -> per-image features, Arrow-batched.

    Decodes netpbm (P5/P6), uncompressed BMP (8/24-bit), and PNG
    (8-bit gray/RGB, all five scanline filters) from first principles
    — see imagecodec.py — and emits (format, width, height, channels,
    pixel mean/min/max, 64-bit average-hash hex).  ``id_cols`` are
    carried through so the output joins back to its source rows.
    Undecodable payloads raise, like a production decoder would; use
    decode_features for the degrade-to-bytes behavior."""
    from .imagecodec import average_hash, decode_image

    keep = list(id_cols)
    schema = StructType(
        [f for f in df.schema.fields if f.name in keep] + list(IMAGE_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                raw = bytes(pdf[bin_col].iloc[idx])
                fmt, px = decode_image(raw)
                flat = px.ravel()
                rows.append(
                    tuple(pdf[k].iloc[idx] for k in keep)
                    + (
                        fmt,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px.shape[2]),
                        float(flat.mean()),
                        int(flat.min()),
                        int(flat.max()),
                        f"{average_hash(px):016x}",
                    )
                )
            yield pd.DataFrame(
                rows, columns=keep + [f.name for f in IMAGE_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=schema)


def image_thumbnail(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = (),
    grid: int = 8,
) -> DataFrame:
    """REAL decode -> grayscale box-filter thumbnail: a ``grid x
    grid`` array of exact block means (float64, row-major), the
    embedding-shaped output a production thumbnailer feeds similarity
    search.  Box filter = np.add.reduceat over both axes with integer
    bin edges — every source pixel contributes to exactly one cell,
    so the thumbnail is an exact partition mean (no interpolation
    libraries).  Undecodable payloads raise (use decode_features for
    degrade-to-bytes)."""
    from .imagecodec import decode_image

    keep = list(id_cols)
    schema = StructType(
        [f for f in df.schema.fields if f.name in keep]
        + [StructField("thumb", ArrayType(DoubleType(), False), False)]
    )

    def box_resize(gray: np.ndarray, g: int) -> np.ndarray:
        h, w = gray.shape
        g_r, g_c = min(g, h), min(g, w)
        r_edges = (np.arange(g_r) * h) // g_r
        c_edges = (np.arange(g_c) * w) // g_c
        csum = np.add.reduceat(gray, c_edges, axis=1)
        cells = np.add.reduceat(csum, r_edges, axis=0)
        r_cnt = np.diff(np.append(r_edges, h))
        c_cnt = np.diff(np.append(c_edges, w))
        cells = cells / np.outer(r_cnt, c_cnt)
        if g_r < g or g_c < g:  # tiny images: repeat edge blocks
            cells = cells[
                np.minimum(np.arange(g), g_r - 1)[:, None],
                np.minimum(np.arange(g), g_c - 1)[None, :],
            ]
        return cells

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                _, px = decode_image(bytes(pdf[bin_col].iloc[idx]))
                gray = px.astype(np.float64).mean(axis=2)
                thumb = box_resize(gray, grid)
                rows.append(
                    tuple(pdf[k].iloc[idx] for k in keep)
                    + (list(thumb.ravel()),)
                )
            yield pd.DataFrame(rows, columns=keep + ["thumb"])

    return df.mapInPandas(run, schema=schema)


def _synth_image_payload(g: int) -> bytes:
    """The synth_images per-row law: deterministic encoded image for
    id ``g`` (shared by the fixture generator and the fused
    synth+decode path so the byte payloads are identical)."""
    from .imagecodec import encode_bmp, encode_png, encode_pnm

    w, h = 4 + g % 13, 3 + g % 11
    c = 1 if g % 6 in (0, 3, 4) else 3
    flat = (g * 31 + np.arange(w * h * c, dtype=np.int64) * 7) % 251
    px = flat.astype(np.uint8).reshape(h, w, c)
    v = g % 6
    if v in (0, 1):
        return encode_pnm(px)
    if v in (2, 3):
        return encode_bmp(px)
    return encode_png(px)


def synth_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """synth_images |> image_features fused into ONE Python boundary
    crossing (guide §4.1): the encoded payload is produced AND decoded
    inside the same batch loop, so the bytes never ship
    JVM->Python->JVM->Python.  Row-for-row identical to running the
    two operators chained (same payload law, same decoder, same
    feature emission)."""
    from .imagecodec import average_hash, decode_image

    src = df.select(F.col(id_col).cast("long").alias(id_col))
    schema = StructType(
        [StructField(id_col, LongType(), False)] + list(IMAGE_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf[id_col]:
                g = int(g)
                fmt, px = decode_image(_synth_image_payload(g))
                flat = px.ravel()
                rows.append(
                    (
                        g,
                        fmt,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px.shape[2]),
                        float(flat.mean()),
                        int(flat.min()),
                        int(flat.max()),
                        f"{average_hash(px):016x}",
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col] + [f.name for f in IMAGE_SCHEMA.fields]
            )

    return src.mapInPandas(run, schema=schema)


def synth_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL encoded images, one per input row: id ``g``
    gets a (4 + g%13) x (3 + g%11) image whose flat pixel ``i`` is
    ``(g*31 + i*7) % 251``, encoded round-robin as PGM / PPM / 24-bit
    BMP / 8-bit paletted BMP / gray PNG / RGB PNG (g % 6).  The
    closed-form pixel law makes decoded stats SQL-checkable without a
    SQL decoder — the fixture side of the multimodal_decode oracle."""
    src = df.select(F.col(id_col).cast("long").alias(id_col))
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(g), _synth_image_payload(int(g))) for g in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return src.mapInPandas(run, schema=schema)


VIDEO_SCHEMA = StructType(
    [
        StructField("video_format", StringType(), False),
        StructField("fps", DoubleType(), False),
        StructField("n_frames", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("px_mean", DoubleType(), False),
        StructField("px_min", LongType(), False),
        StructField("px_max", LongType(), False),
        StructField("motion_mean", DoubleType(), False),
    ]
)


def video_features(
    df: DataFrame, bin_col: str = "payload", id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """REAL video decode -> per-clip features, Arrow-batched.

    Decodes YUV4MPEG2 (Cmono/C444/C420) and uncompressed RIFF/AVI
    (raw bottom-up DIB frames) from first principles — see
    videocodec.py — and emits (format, fps, frame count, dims,
    whole-clip pixel mean/min/max, motion energy = mean absolute
    temporal difference).  ``id_cols`` are carried through so the
    output joins back to its source rows.  Undecodable payloads
    raise, like a production decoder would.  Map-only pass — no
    shuffle, no state, cost linear in corpus bytes; partition
    parallelism is the scale axis at 100 TB."""
    from .videocodec import decode_video, video_stats

    keep = list(id_cols)
    schema = StructType(
        [f for f in df.schema.fields if f.name in keep] + list(VIDEO_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                fmt, fps, frames = decode_video(bytes(pdf[bin_col].iloc[idx]))
                s = video_stats(frames)
                n, h, w, c = frames.shape
                rows.append(
                    tuple(pdf[k].iloc[idx] for k in keep)
                    + (
                        fmt,
                        float(fps),
                        int(n),
                        int(w),
                        int(h),
                        int(c),
                        s["px_mean"],
                        s["px_min"],
                        s["px_max"],
                        s["motion_mean"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=keep + [f.name for f in VIDEO_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=schema)


def video_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_cols: tuple[str, ...] = (),
    stride: int = 1,
) -> DataFrame:
    """REAL frame sampling: decode each clip and emit one row per
    sampled frame (every ``stride``-th), the 1:N mapInPandas fan-out a
    frame-level training pipeline consumes.  Per-frame stats are
    vectorized NumPy over the decoded raster."""
    from .videocodec import decode_video

    keep = list(id_cols)
    schema = StructType(
        [f for f in df.schema.fields if f.name in keep]
        + [
            StructField("frame_idx", LongType(), False),
            StructField("frame_mean", DoubleType(), False),
            StructField("frame_min", LongType(), False),
            StructField("frame_max", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                _, _, frames = decode_video(bytes(pdf[bin_col].iloc[idx]))
                ids = tuple(pdf[k].iloc[idx] for k in keep)
                flat = frames.reshape(frames.shape[0], -1).astype(np.int64)
                for fi in range(0, frames.shape[0], stride):
                    rows.append(
                        ids
                        + (
                            fi,
                            float(flat[fi].sum() / flat[fi].size),
                            int(flat[fi].min()),
                            int(flat[fi].max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=keep + ["frame_idx", "frame_mean", "frame_min", "frame_max"],
            )

    return df.mapInPandas(run, schema=schema)


def synth_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL encoded video clips, one per input row: id
    ``g`` gets ``2 + g%5`` frames of ``(4 + g%9) x (3 + g%7)`` pixels
    with ``1`` (g%3==0) or ``3`` channels, at ``[10,20,25,50][g%4]``
    fps, where flat sample ``i`` of the (n, h, w, c) clip array is
    ``(g*29 + i*13) % 247``.  Encoded round-robin as Y4M Cmono / Y4M
    C444 / uncompressed AVI (g % 3; mono clips in AVI slots use 8-bit
    DIBs).  The closed-form sample law makes decoded stats
    SQL-checkable without a SQL decoder — the fixture side of the
    video_features oracle."""
    from .videocodec import encode_avi, encode_y4m

    src = df.select(F.col(id_col).cast("long").alias(id_col))
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf[id_col]:
                g = int(g)
                n, w, h = 2 + g % 5, 4 + g % 9, 3 + g % 7
                c = 1 if g % 3 == 0 else 3
                fps = (10, 20, 25, 50)[g % 4]
                i = np.arange(n * h * w * c, dtype=np.int64)
                frames = ((g * 29 + i * 13) % 247).astype(np.uint8).reshape(n, h, w, c)
                if g % 3 == 2:
                    payload = encode_avi(frames, float(fps))
                else:
                    payload = encode_y4m(frames, fps, 1)
                rows.append((g, payload))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return src.mapInPandas(run, schema=schema)


AUDIO_SCHEMA = StructType(
    [
        StructField("sample_rate", LongType(), False),
        StructField("channels", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_s", DoubleType(), False),
        StructField("amp_mean", DoubleType(), False),
        StructField("amp_min", LongType(), False),
        StructField("amp_max", LongType(), False),
        StructField("rms", DoubleType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def audio_features(
    df: DataFrame, bin_col: str = "payload", id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """REAL WAV decode -> per-clip features, Arrow-batched.

    Decodes RIFF/WAVE PCM (8/16/24/32-bit int + IEEE float32/64, any
    channel count, arbitrary chunk order) from first principles — see
    audiocodec.py — and emits (sample_rate, channels, n_frames,
    duration_s, amplitude mean/min/max, rms, strict-sign zero-crossing
    count per channel lane summed).  ``id_cols`` are carried through so
    the output joins back to its source rows.  Undecodable payloads
    raise, like a production decoder would; this is a map-only pass —
    no shuffle, cost linear in corpus bytes at any scale."""
    from .audiocodec import audio_stats, decode_wav

    keep = list(id_cols)
    schema = StructType(
        [f for f in df.schema.fields if f.name in keep] + list(AUDIO_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for idx in range(len(pdf)):
                rate, samples = decode_wav(bytes(pdf[bin_col].iloc[idx]))
                s = audio_stats(samples)
                rows.append(
                    tuple(pdf[k].iloc[idx] for k in keep)
                    + (
                        int(rate),
                        int(samples.shape[1]),
                        int(samples.shape[0]),
                        float(samples.shape[0] / rate),
                        s["amp_mean"],
                        int(s["amp_min"]),
                        int(s["amp_max"]),
                        s["rms"],
                        int(s["zero_crossings"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=keep + [f.name for f in AUDIO_SCHEMA.fields]
            )

    return df.mapInPandas(run, schema=schema)


def _synth_wav_payload(g: int) -> bytes:
    """The synth_audio per-row law (shared by the fixture generator
    and the fused synth+decode path — identical bytes)."""
    from .audiocodec import encode_wav

    n = 40 + g % 97
    ch = 1 + g % 2
    rate = 8000 * (1 + g % 3)
    i = np.arange(n * ch, dtype=np.int64)
    flat = ((g * 37 + i * 11) % 65521) - 32760
    samples = flat.astype(np.int16).reshape(n, ch)
    extra = [(b"LIST", b"INFOjunk!")] if g % 5 == 0 else None
    return encode_wav(samples, rate, extra_chunks=extra)


def synth_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """synth_audio |> audio_features fused into ONE Python boundary
    crossing (guide §4.1) — the WAV bytes are encoded and decoded in
    the same batch loop instead of shipping across the JVM twice.
    Row-for-row identical to the chained operators."""
    from .audiocodec import audio_stats, decode_wav

    src = df.select(F.col(id_col).cast("long").alias(id_col))
    schema = StructType(
        [StructField(id_col, LongType(), False)] + list(AUDIO_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for g in pdf[id_col]:
                g = int(g)
                rate, samples = decode_wav(_synth_wav_payload(g))
                s = audio_stats(samples)
                rows.append(
                    (
                        g,
                        int(rate),
                        int(samples.shape[1]),
                        int(samples.shape[0]),
                        float(samples.shape[0] / rate),
                        s["amp_mean"],
                        int(s["amp_min"]),
                        int(s["amp_max"]),
                        s["rms"],
                        int(s["zero_crossings"]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col] + [f.name for f in AUDIO_SCHEMA.fields]
            )

    return src.mapInPandas(run, schema=schema)


def synth_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL encoded WAV clips, one per input row: id
    ``g`` gets ``40 + g%97`` frames of ``1 + g%2`` channels at
    ``8000*(1 + g%3)`` Hz, with interleaved flat sample ``i`` equal to
    ``((g*37 + i*11) % 65521) - 32760`` (int16-safe), encoded as
    16-bit PCM.  Every 5th clip carries a junk LIST chunk before (g%5
    == 0) or a trailing pad scenario after (odd byte counts) the data
    chunk, so the RIFF chunk walk is exercised on real variety.  The
    closed-form sample law makes decoded stats SQL-checkable without a
    SQL decoder — the fixture side of the audio_features oracle."""
    src = df.select(F.col(id_col).cast("long").alias(id_col))
    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(g), _synth_wav_payload(int(g))) for g in pdf[id_col]]
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return src.mapInPandas(run, schema=schema)
