"""Event-stream operators: windowed aggregation, sessionization, as-of lookup.

The reference's only stream-shaped workload is the upsert path
(README.md:69-70, handled in streaming/upsert.py); these operators cover
the events table the engine is expected to process as a first-class
capability. All are window/groupBy compositions — shuffle once on the
partition key, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hourly_rollup(df: DataFrame, ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Tumbling-hour aggregate per event type.

    Hour rendered as a string so batch output is comparable across engines
    regardless of ns/us timestamp precision. In streaming mode the same
    logic is F.window(ts, '1 hour') + watermark.
    """
    hour = F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH")
    agg = df.groupBy(hour.alias("hour"), F.col(type_col)).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    # avg derived from the ROUNDED sum, not a separate AVG aggregate: the
    # raw partial-sum order differs between Spark partitions and the
    # DuckDB oracle's sequential scan, and at enough groups one average
    # lands on a 6-decimal rounding boundary (seen at sf0.1). The rounded
    # sum is bit-identical cross-engine, so sum/cnt is too.
    return agg.withColumn(
        "avg_value", F.round(F.col("sum_value") / F.col("cnt"), 6)
    )


def sliding_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding-window aggregate: each event lands in window/slide
    overlapping windows (F.window assigns them all at once — one pass,
    one shuffle on (window, type)). Streaming form: identical expression
    after withWatermark."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), window, slide).alias("win"), F.col(type_col)
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("window_start"),
            type_col,
            "cnt",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    gap: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Gap-based sessionization: a >gap silence starts a new session.

    ``ts_col`` is a NUMERIC event time (default: microseconds since epoch)
    and ``gap`` is in the same unit — integer-exact, so results match any
    other engine bit-for-bit. Classic lag + cumulative-sum over a per-user
    window: one shuffle on user_id. Returns per-user session stats.
    (Streaming equivalent: applyInPandasWithState / session_window.)
    """
    order_cols = [F.col(ts_col).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > F.lit(gap))
    ).cast("long")
    with_sess = df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = with_sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )


def last_event_before(
    df: DataFrame,
    match_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """As-of self-lookup: for each event, ts of the user's most recent
    earlier-or-equal event of ``match_type``.

    The as-of join re-expressed as a running max over an ordered window —
    one shuffle on the user key, no range join explosion.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.max(
        F.when(F.col("event_type") == match_type, F.col(ts_col))
    ).over(w)
    return df.select(
        "event_id",
        user_col,
        F.date_format(F.col(ts_col), "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.date_format(asof, "yyyy-MM-dd HH:mm:ss").alias("last_purchase_ts"),
    )


def gap_filled_hourly(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hourly rollup with ZERO-FILLED gaps — the resample step every
    time-series pipeline needs before windowed models: missing
    (hour, type) cells appear as explicit zeros instead of silently
    vanishing (downstream moving averages over a sparse rollup are
    wrong, not just incomplete).

    Shape: the real rollup is one groupBy scan; the dense calendar
    comes from F.sequence over the observed [min, max] hour — a 1-row
    aggregate exploded engine-side (never a driver loop) — cross-joined
    with the distinct type set (both broadcast-trivial), left-joined by
    the rollup. At 100 TB the only data-sized work is still the one
    rollup shuffle.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    rolled = (
        df.groupBy(hour.alias("h"), type_col)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .localCheckpoint()  # tiny; stops the grid branches re-scanning
    )
    span = rolled.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = span.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = rolled.select(type_col).distinct()
    return (
        hours.crossJoin(F.broadcast(types))
        .join(rolled, ["h", type_col], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH").alias("hour"),
            type_col,
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("hour", type_col)
    )


def session_paths(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    gap: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Top-k event-type n-gram paths WITHIN sessions — the path-mining
    companion to event_transitions (which counts adjacent pairs across
    the whole stream, ignoring session boundaries). Reuses sessionize's
    gap logic; per-session sequences order on the total key
    (ts, event_id), n-grams fan out of one transform (sequence guarded
    by size >= n — Spark's sequence(a, b) runs DESCENDING when b < a),
    and the top-k is count desc then path asc (total order). One
    user-shuffle + one path-shuffle; TakeOrderedAndProject for the k."""
    order_cols = [F.col(ts_col).asc(), F.col("event_id").asc()]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > F.lit(gap))
    ).cast("long")
    with_sess = df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seqs = (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col("event_id").alias("e"),
                            F.col(type_col).alias("y"),
                        )
                    )
                ),
                lambda s: s["y"],
            ).alias("_seq")
        )
        .filter(F.size("_seq") >= n)
    )
    grams = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_seq") - n),
                lambda i: F.concat_ws(
                    ">", *[F.element_at("_seq", (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        ).alias("path")
    )
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(k)
    )
