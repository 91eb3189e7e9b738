"""Time-series anomaly detection over event streams: per-type hourly
burst/drop flags against a truncated-EWMA baseline.

The detector every metrics pipeline runs first: dense hourly counts per
group (explicit zeros — a sparse rollup silently hides drops), a
baseline from the PREVIOUS up-to-W hours weighted by exponential decay,
and burst/drop flags when the current hour deviates by a factor.

Cross-engine exactness (the house fixed-point discipline): decay
alpha = 1/2 makes the weight for the hour k steps back ``2^(W-k)`` — a
POWER OF TWO, so the weighted baseline is a pure integer pair
(numerator = sum cnt_k * 2^(32-k), denominator = 2^32 - 2^(32-L)) and
the flags are integer comparisons ``cnt * den > factor * num`` — no
float ever enters the decision, and any SQL engine replays it bit for
bit. (cnt <= 2^20 and den <= 2^32 keep every product inside int64.)

Scale shape: one rollup shuffle over the events (groupBy type, hour);
the dense grid is a 1-row-aggregate sequence explode crossed with the
distinct type set; the EWMA is a bounded ROWS window (collect_list of
<= W ints per row) — no self-joins, no driver loops, state O(W) per
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HOUR_US = 3_600_000_000


def hourly_burst_anomalies(
    events: DataFrame,
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    window_hours: int = 32,
    min_history: int = 8,
    burst_factor: int = 2,
    drop_factor: int = 2,
) -> DataFrame:
    """Flag (type, hour) cells whose count exceeds ``burst_factor`` x
    the decayed baseline of the previous hours, or falls below
    ``1/drop_factor`` x it. Rows with fewer than ``min_history`` prior
    hours in the window never flag (cold start). Returns ONLY flagged
    rows: (event_type, hour_us, cnt, baseline, is_burst, is_drop).
    """
    # FLOOR division, not DIV (which truncates toward zero): pre-epoch
    # (negative) timestamps must bucket into the same hour as SQL
    # engines' floor `//`, or the bit-exactness contract breaks at the
    # epoch boundary. Integer-exact: subtract 1 when a negative ts has
    # a remainder.
    hour = F.expr(
        f"({ts_col} DIV {HOUR_US}) - (CASE WHEN {ts_col} % {HOUR_US} != 0 "
        f"AND {ts_col} < 0 THEN 1 ELSE 0 END)"
    )
    counts = events.groupBy(F.col(type_col), hour.alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return flag_hourly_counts(
        counts,
        type_col=type_col,
        window_hours=window_hours,
        min_history=min_history,
        burst_factor=burst_factor,
        drop_factor=drop_factor,
    )


def flag_hourly_counts(
    counts: DataFrame,
    type_col: str = "event_type",
    window_hours: int = 32,
    min_history: int = 8,
    burst_factor: int = 2,
    drop_factor: int = 2,
) -> DataFrame:
    """The flag stage alone, over an already-aggregated (type, h, cnt)
    table — shared by the batch detector and the streaming twin (a
    watermarked tumbling-window count stream drained to a table feeds
    the SAME flags, which is what makes the streamed form answer the
    identical oracle)."""
    counts = counts.localCheckpoint()  # tiny; grid branches must not re-scan
    if window_hours > 32:
        raise ValueError("window_hours > 32 overflows the 2^(32-k) weights")
    span = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        span.select(F.explode(F.sequence("lo", "hi")).alias("h"))
        .crossJoin(F.broadcast(counts.select(type_col).distinct()))
    )
    dense = grid.join(counts, ["h", type_col], "left").select(
        type_col, "h", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("h")
        .rowsBetween(-window_hours, -1)
    )
    dense = dense.withColumn("hist", F.collect_list("cnt").over(w))
    L = F.size("hist")
    num = F.when(L == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            "aggregate(sequence(0, size(hist) - 1), CAST(0 AS BIGINT), "
            "(acc, j) -> acc + hist[j] * shiftleft(CAST(1 AS BIGINT), "
            "32 - (size(hist) - j)))"
        )
    )
    den = F.expr(
        "shiftleft(CAST(1 AS BIGINT), 32) "
        "- shiftleft(CAST(1 AS BIGINT), 32 - size(hist))"
    )
    scored = dense.select(
        type_col,
        (F.col("h") * HOUR_US).alias("hour_us"),
        F.col("cnt").cast("bigint").alias("cnt"),
        L.alias("_L"),
        num.alias("_num"),
        den.alias("_den"),
    )
    is_burst = F.col("cnt") * F.col("_den") > burst_factor * F.col("_num")
    is_drop = drop_factor * F.col("cnt") * F.col("_den") < F.col("_num")
    return (
        scored.filter((F.col("_L") >= min_history) & (is_burst | is_drop))
        .select(
            type_col,
            "hour_us",
            "cnt",
            F.round(F.col("_num").cast("double") / F.col("_den"), 6).alias(
                "baseline"
            ),
            is_burst.alias("is_burst"),
            is_drop.alias("is_drop"),
        )
    )
