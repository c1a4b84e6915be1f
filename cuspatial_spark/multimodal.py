"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, batching, partitioning, UDF
signatures) is real and tested; the actual codec calls are STUBBED
because no image/audio libraries exist in this environment — the stub
derives deterministic fake features from the bytes so pipelines are
end-to-end testable.  Swap ``_decode_stub`` for PIL/librosa/ffmpeg in
production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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
    the codec boundary itself, which is per-item in any real decoder)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[bin_col]:
                arr = _decode_stub(bytes(payload))
                hist = np.bincount(arr >> 5, minlength=8).astype(np.int64)
                rows.append(
                    (
                        hashlib.md5(bytes(payload)).hexdigest(),
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
