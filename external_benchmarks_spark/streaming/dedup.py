"""Streaming ingest deduplication — the streaming form of
operators/dedup.exact_dedup_groups.

A training-data ingest stream re-delivers documents (at-least-once
sources, retried producers); this drops re-deliveries on the fly with
watermark-bounded state: each key is remembered only until the watermark
passes it (``dropDuplicatesWithinWatermark``), so state is O(keys per
watermark window), not O(all keys ever) — the property that makes it
viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_keys(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key was already seen within the watermark window."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_dedup_content(
    docs: DataFrame,
    content_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-content dedup on a document stream: key = md5(content), the
    same 16-byte shuffle key as the batch operator."""
    hashed = docs.withColumn("_content_hash", F.md5(F.col(content_col)))
    return (
        stream_dedup_keys(hashed, ["_content_hash"], ts_col, watermark)
        .drop("_content_hash")
    )
