"""Streaming windowed aggregation with watermarks — the Structured
Streaming form of operators/sessions.hourly_rollup.

The reference has no continuous-aggregation workload (its only stream is
the upsert path), but an engine serving event tables at scale needs the
standard watermark + tumbling-window aggregate; this module provides it
with the same output schema as the batch rollup so batch and streaming
results are interchangeable (the lambda-architecture contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """readStream events -> watermarked tumbling-window counts/sums.

    Late rows beyond ``watermark`` are dropped and their window state
    evicted — bounded state at any scale. Output matches
    operators/sessions.hourly_rollup plus explicit window bounds.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        # avg derived from the ROUNDED sum exactly like the batch rollup
        # (operators/sessions.hourly_rollup): the rounded sum is
        # bit-identical across engines and partition orders, so streaming,
        # batch, and the DuckDB oracle agree to the last bit.
        .withColumn("avg_value", F.round(F.col("sum_value") / F.col("cnt"), 6))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            type_col,
            "cnt",
            "sum_value",
            "avg_value",
        )
    )
