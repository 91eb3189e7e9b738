"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio libraries, so the decode kernels are
STUBS (deterministic fakes clearly marked below) — but the Spark-side
plumbing is real and tested: schemas, Arrow batch shapes, mapInPandas
signatures, and partitioning are exactly what a production decode would
use. Swapping ``_decode_stub`` for PIL/torchaudio is a one-function
change per kernel.

Design for 100 TB: blobs never pass through Python row-at-a-time; each
mapInPandas batch receives a pandas column of bytes (Arrow buffers),
processes vectorized-or-looped per batch, and emits fixed-schema
records. Large blobs should be stored in parquet with
``spark.sql.parquet.columnarReaderBatchSize`` tuned down so batches fit
memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha_prefix", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("mfcc", ArrayType(FloatType())),
    ]
)

THUMBNAIL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def blob_metadata(df: DataFrame, blob_col: str, key_col: str = "doc_id") -> DataFrame:
    """Pure-Catalyst blob metadata: byte length + digest prefix. No Python."""
    return df.select(
        F.col(key_col),
        F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        F.substring(F.sha2(F.col(blob_col), 256), 1, 16).alias("sha_prefix"),
    )


def _decode_stub(blob: bytes, dim: int = 8) -> tuple[int, int, np.ndarray]:
    """STUB image decode: a real implementation would be PIL.Image.open.

    Deterministic fake: dimensions and feature vector derive from the blob
    digest, so tests are stable and the pipeline shape is real.
    """
    h = hashlib.md5(blob or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    seed = int.from_bytes(h[2:6], "big")
    rng = np.random.RandomState(seed)
    feat = rng.randn(dim).astype(np.float32)
    return width, height, feat


def decode_image_stub(df: DataFrame, blob_col: str, key_col: str = "doc_id", dim: int = 8) -> DataFrame:
    """mapInPandas image decode+featurize (stubbed kernel, real plumbing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                w, hgt, feat = _decode_stub(bytes(blob) if blob is not None else b"", dim)
                recs.append((key, w, hgt, list(feat)))
            yield pd.DataFrame(recs, columns=["doc_id", "width", "height", "feature"])

    return df.select(key_col, blob_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def decode_audio_stub(
    df: DataFrame, blob_col: str, key_col: str = "doc_id", n_mfcc: int = 8
) -> DataFrame:
    """mapInPandas audio decode+featurize (stubbed kernel, real plumbing).

    A real implementation would demux/resample with torchaudio/soundfile
    and compute MFCCs per batch; the stub derives sample_rate, duration,
    and the coefficient vector deterministically from the blob digest so
    the batch shape, schema, and partitioning are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                h = hashlib.md5(b).digest()
                sample_rate = (8000, 16000, 22050, 44100)[h[0] % 4]
                # STUB duration: bytes at a fake fixed bitrate
                duration_ms = len(b) * 1000 // max(sample_rate // 500, 1)
                rng = np.random.RandomState(int.from_bytes(h[4:8], "big"))
                mfcc = rng.randn(n_mfcc).astype(np.float32)
                recs.append((key, sample_rate, duration_ms, list(mfcc)))
            yield pd.DataFrame(
                recs, columns=["doc_id", "sample_rate", "duration_ms", "mfcc"]
            )

    return df.select(key_col, blob_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resize_image_stub(
    df: DataFrame,
    blob_col: str,
    key_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """mapInPandas binary->binary thumbnail resize (stubbed kernel).

    Real impl: PIL decode -> resize -> re-encode. The stub emits a
    deterministic width*height-byte payload derived from the source
    digest, preserving the production property under test: binary in,
    fixed-size binary out, batch-at-a-time through Arrow.
    """
    out_len = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                seed = hashlib.md5(b).digest()
                reps = out_len // len(seed) + 1
                recs.append((key, width, height, (seed * reps)[:out_len]))
            yield pd.DataFrame(recs, columns=["doc_id", "width", "height", "thumb"])

    return df.select(key_col, blob_col).mapInPandas(run, THUMBNAIL_SCHEMA)


def frame_sample_stub(
    df: DataFrame, blob_col: str, key_col: str = "doc_id", every_n: int = 10
) -> DataFrame:
    """STUB video frame sampling: real impl would demux with pyav; here each
    'frame' is a byte-slice index — the explode/partition shape is what
    matters at scale (one blob -> many frame rows)."""
    n_frames = (F.length(F.col(blob_col)) / every_n).cast("int")
    return df.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    )
