"""Cohort retention analysis — the classic product-analytics matrix
(cohort x week-offset -> share of the cohort still active), the
companion to the event funnel (operators/funnel.py) and sessionization
(operators/sessions.py) the reference's events surface implies.

100 TB shape: ONE corpus-sized shuffle. Instead of the textbook
first-activity self-join (activity JOIN first_seen ON user — two
shuffles of the event table), group the events once per user and
derive everything from the per-user distinct-week set:

    groupBy(user) -> collect_set(week)       (map-side combinable;
                                              set bounded by the
                                              calendar, not by events)
    cohort = array_min(weeks); explode       -> (cohort, offset) rows
    groupBy(cohort, offset) -> count         (matrix-sized, tiny)

The cohort-size denominator is a partitioned window over the matrix's
own offset-0 rows — matrix-sized, and crucially NOT a join back to a
second copy of the matrix, which would replay the corpus aggregation
twice (the plan test pins FileScan == 1). Retention shares are integer ppm
(active * 1e6 div size), exact in any engine; week offsets are
day-difference div 7 on week-truncated timestamps (always a multiple
of 7, so the division is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, active_users, cohort_size,
    retention_ppm): for each first-activity week cohort, how many of
    its users were active again k weeks later."""
    wk = F.date_trunc("week", F.col(ts_col))
    return matrix_from_activity(
        events.select(F.col(user_col).alias("_u"), wk.alias("_wk"))
    )


def matrix_from_activity(pairs: DataFrame) -> DataFrame:
    """The retention matrix from (_u, _wk) activity rows (duplicates
    fine — the per-user set dedups). Shared by the batch operator and
    the streaming twin (streaming/retention.py), so the two are
    bit-identical BY CONSTRUCTION once their activity sets agree."""
    per_user = (
        pairs
        .groupBy("_u")
        .agg(F.collect_set("_wk").alias("_wks"))
        .select(F.array_min("_wks").alias("_cohort"), F.explode("_wks").alias("_wk"))
    )
    matrix = (
        per_user.select(
            F.col("_cohort").cast("date").alias("cohort_week"),
            (F.datediff(F.col("_wk"), F.col("_cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    # every cohort has an offset-0 row by construction (cohort = min
    # week), so the window max is never null
    w = Window.partitionBy("cohort_week")
    return (
        matrix.withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("week_offset") == 0, F.col("active_users"))
            ).over(w),
        )
        .withColumn(
            "retention_ppm",
            F.expr("active_users * 1000000 div cohort_size").cast("bigint"),
        )
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            "retention_ppm",
        )
    )
