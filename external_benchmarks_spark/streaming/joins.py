"""Watermarked stream-stream interval join — the attribution pattern
(click joined to the impression that preceded it within a horizon).

Both sides carry watermarks and the join predicate bounds the event-time
distance, so Spark can evict buffered state: an impression is held only
until (its ts + horizon) passes the click watermark — bounded state on
two unbounded streams, the requirement for running this at 100 TB/day.
The reference has no stream-stream workload; this completes the
streaming surface alongside upsert, windows, stateful sessions, and
ingest dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "1 hour",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> DataFrame:
    """left row joins right rows with right_ts in [left_ts - horizon, left_ts].

    Column names (other than ``on``) must be disjoint; the right ts column
    is exposed as ``right_ts_out``. Inner join — rows with no partner in
    the horizon are dropped (use the batch operators/rangejoin for outer
    semantics on bounded data).
    """
    return _interval_join(
        left, right, on, left_ts, right_ts, horizon,
        left_watermark, right_watermark, how="inner",
    )


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str,
    left_watermark: str,
    right_watermark: str,
    how: str,
) -> DataFrame:
    """Shared builder: watermarks, right-side renames, and the interval
    condition live in ONE place so the inner and outer variants cannot
    drift."""
    l_marked = left.withWatermark(left_ts, left_watermark)
    r_marked = (
        right.withColumnRenamed(right_ts, "right_ts_out")
        .withColumnRenamed(on, "_r_key")
        .withWatermark("right_ts_out", right_watermark)
    )
    cond = (
        (F.col(on) == F.col("_r_key"))
        & (F.col("right_ts_out") <= F.col(left_ts))
        & (F.col("right_ts_out") >= F.col(left_ts) - F.expr(f"INTERVAL {horizon}"))
    )
    return l_marked.join(r_marked, cond, how).drop("_r_key")


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "1 hour",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like interval_join, but
    left rows with no partner in the horizon are EMITTED with nulls once
    the watermark proves no partner can still arrive (right watermark
    past left_ts; Spark then evicts and null-pads).

    Flush semantics to know at 100 TB: unmatched rows surface only when
    the watermark ADVANCES PAST them — which happens between
    micro-batches. On a bounded replay (availableNow) the tail of the
    stream never sees a later batch, so unmatched rows near the end stay
    buffered unless a later event (or a sentinel heartbeat, the pattern
    used in tests/test_stream_join.py) advances the watermark. On a live
    stream this is the normal steady state: results lag by watermark +
    horizon, exactly the staleness the eviction bound buys.
    """
    return _interval_join(
        left, right, on, left_ts, right_ts, horizon,
        left_watermark, right_watermark, how="left_outer",
    )
