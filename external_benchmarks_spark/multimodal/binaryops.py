"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Two tiers of decode kernel:

- REAL decoders for PNG, BMP, GIF (incl. LZW), baseline JPEG, and
  WAV/PCM16 (``decode_image`` auto-dispatches on magic bytes via
  multimodal/codecs.py — pure stdlib/numpy: full PNG filter reversal,
  GIF variable-width LZW, JPEG Huffman+DCT, RIFF container parse). PIL
  is preferred when installed (import-gated); the pure decoders are the
  always-available fallback. The lossless formats are oracle-verified
  (``image_decode``, ``image_decode_multiformat``); JPEG is
  PSNR-verified in pytest because it is lossy by design.
- STUB kernels (``decode_image_stub`` etc., clearly marked) for formats
  the container can't parse (MP3/MP4 video) — deterministic fakes that
  keep the Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
  signatures, partitioning) real and tested; swapping in
  torchaudio/pyav is a one-function change per kernel.

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
    DoubleType,
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("mean_amp", DoubleType()),
    ]
)


def make_image_blobs(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Generate a REAL PNG per row (vertical-gradient grayscale whose
    geometry/pixels derive from the key): width = 8 + key % 9, height =
    8 + key % 7, row r filled with (key + r) % 256. Real bytes through a
    real encoder — and every decoded statistic is independently
    computable from the key by arithmetic, which is what lets an external
    SQL oracle hash-check the full encode->decode pipeline."""
    from external_benchmarks_spark.multimodal.codecs import encode_png

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            w, h = 8 + k % 9, 8 + k % 7
            img = (
                (k + np.arange(h, dtype=np.int64)) % 256
            ).astype(np.uint8)[:, None] * np.ones((1, w), dtype=np.uint8)
            out.append(encode_png(img))
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def make_multiformat_image_blobs(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Same deterministic gradient as make_image_blobs, but the container
    format rotates by key: PNG, BMP, or GIF (all REAL encoders,
    multimodal/codecs.py). BMP/GIF carry the gray value replicated into
    RGB, so the luminance statistics are IDENTICAL to the PNG path — the
    one SQL oracle checks three container formats and their decoders."""
    from external_benchmarks_spark.multimodal.codecs import (
        encode_bmp,
        encode_gif,
        encode_png,
    )

    encoders = (encode_png, encode_bmp, encode_gif)

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            w, h = 8 + k % 9, 8 + k % 7
            img = (
                (k + np.arange(h, dtype=np.int64)) % 256
            ).astype(np.uint8)[:, None] * np.ones((1, w), dtype=np.uint8)
            out.append(encoders[k % 3](img))
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def decode_image(df: DataFrame, blob_col: str, key_col: str = "doc_id") -> DataFrame:
    """mapInPandas image decode with a REAL kernel: PIL when installed,
    else the pure-stdlib PNG decoder (multimodal/codecs.py). Emits pixel
    statistics per blob; raises on non-image bytes (route those through
    decode_image_stub or a quarantine filter instead)."""
    try:  # pragma: no cover - container has no PIL; exercised when present
        from PIL import Image  # type: ignore

        def _open(b: bytes) -> np.ndarray:
            import io

            return np.asarray(Image.open(io.BytesIO(b)).convert("L"))
    except ImportError:
        from external_benchmarks_spark.multimodal.codecs import decode_image_auto

        def _open(b: bytes) -> np.ndarray:
            # magic-byte dispatch: PNG/BMP/GIF/JPEG all decode with the
            # pure-stdlib codecs (multimodal/codecs.py)
            arr = decode_image_auto(b)
            # luminance reduce for RGB; grayscale passes through
            return arr if arr.ndim == 2 else arr.mean(axis=2).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                img = _open(bytes(blob))
                recs.append(
                    (
                        int(key),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        float(img.mean()),
                        int(img.min()),
                        int(img.max()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=["doc_id", "width", "height", "mean_px", "min_px", "max_px"],
            )

    return df.select(key_col, blob_col).mapInPandas(run, IMAGE_STATS_SCHEMA)


def make_audio_blobs(
    df: DataFrame, key_col: str = "doc_id", sample_rate: int = 16000
) -> DataFrame:
    """Generate a REAL WAV/PCM16 file per row: an alternating ±amp square
    wave with amp = (key % 100) * 256 and 64 + key % 37 samples — every
    decoded statistic (peak, rms, mean) is exact integer arithmetic on
    the key, SQL-oracle-checkable end to end."""
    from external_benchmarks_spark.multimodal.codecs import encode_wav_pcm16

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            n = 64 + k % 37
            amp = (k % 100) * 256
            samples = np.full(n, amp, dtype=np.int64)
            samples[1::2] *= -1
            out.append(encode_wav_pcm16(samples.astype(np.int16), sample_rate))
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def decode_audio(df: DataFrame, blob_col: str, key_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio decode with a REAL kernel: RIFF/WAV parse via the
    stdlib wave module (multimodal/codecs.py). Emits amplitude statistics
    per blob."""
    from external_benchmarks_spark.multimodal.codecs import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                rate, samples = decode_wav(bytes(blob))
                x = samples.astype(np.float64)
                recs.append(
                    (
                        int(key),
                        int(rate),
                        int(len(samples)),
                        int(np.abs(samples.astype(np.int64)).max()) if len(samples) else 0,
                        float(np.sqrt(np.mean(x * x))) if len(samples) else 0.0,
                        float(x.mean()) if len(samples) else 0.0,
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "peak", "rms", "mean_amp",
                ],
            )

    return df.select(key_col, blob_col).mapInPandas(run, AUDIO_STATS_SCHEMA)


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


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
        StructField("min_px", IntegerType()),
        StructField("max_px", IntegerType()),
    ]
)


def resize_image(
    df: DataFrame,
    blob_col: str,
    key_col: str = "doc_id",
    width: int = 32,
    height: int = 32,
) -> DataFrame:
    """REAL binary->binary thumbnail kernel: decode (any supported
    format via magic bytes), integer nearest-neighbor resize, re-encode
    as PNG. Same Arrow-batch shape as resize_image_stub; PIL swaps in
    transparently when installed."""
    from external_benchmarks_spark.multimodal.codecs import (
        decode_image_auto,
        encode_png,
        resize_nearest,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                img = decode_image_auto(bytes(blob))
                thumb = resize_nearest(img, width, height)
                recs.append((int(key), width, height, encode_png(thumb)))
            yield pd.DataFrame(recs, columns=["doc_id", "width", "height", "thumb"])

    return df.select(key_col, blob_col).mapInPandas(run, THUMBNAIL_SCHEMA)


def make_video_blobs(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Generate a REAL multi-frame container per row (animated GIF89a —
    the one video-like format with a full pure-stdlib codec here):
    3 + key % 4 frames of the deterministic gradient, frame f's rows
    being (key + 7*f + r) % 256. Every per-frame statistic is integer
    arithmetic on (key, f), so frame sampling is SQL-oracle-checkable."""
    from external_benchmarks_spark.multimodal.codecs import encode_gif_frames

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            w, h = 8 + k % 9, 8 + k % 7
            frames = []
            for f in range(3 + k % 4):
                img = (
                    (k + 7 * f + np.arange(h, dtype=np.int64)) % 256
                ).astype(np.uint8)[:, None] * np.ones((1, w), dtype=np.uint8)
                frames.append(img)
            out.append(encode_gif_frames(frames))
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def frame_sample(
    df: DataFrame, blob_col: str, key_col: str = "doc_id", every_n: int = 2
) -> DataFrame:
    """REAL video frame sampling: demux an animated GIF, keep every
    ``every_n``-th frame, emit per-frame luminance statistics. One blob
    -> many frame rows (the explode/partition shape of video pipelines);
    a pyav-backed kernel for MP4 has the identical signature."""
    from external_benchmarks_spark.multimodal.codecs import decode_gif_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                frames = decode_gif_frames(bytes(blob))
                for i in range(0, len(frames), every_n):
                    img = frames[i]
                    gray = img if img.ndim == 2 else img.mean(axis=2).astype(np.uint8)
                    recs.append(
                        (
                            int(key),
                            int(i),
                            int(gray.shape[1]),
                            int(gray.shape[0]),
                            float(gray.mean()),
                            int(gray.min()),
                            int(gray.max()),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "mean_px", "min_px", "max_px",
                ],
            )

    return df.select(key_col, blob_col).mapInPandas(run, FRAME_STATS_SCHEMA)
