"""Event-sequence analytics: first-touch funnels and transition matrices.

The reference's events surface stops at per-type counts and hourly
rollups (scripts/generate_benchmark_reports.py:207-219); a training-data
/ product-analytics pipeline over the same (user_id, ts, event_type)
stream also needs ordered-sequence queries. Both operators here are pure
conditional aggregation / one window pass — single shuffle on user_id,
no self-joins, no Python — so they hold at 100 TB (state per user is a
handful of timestamps, and the final reduce is a global agg of O(stages)
columns or an O(types^2) group count).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_STAGES: tuple[str, ...] = ("signup", "click", "purchase")


def event_funnel(
    events: DataFrame,
    stages: Sequence[str] = DEFAULT_STAGES,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """First-touch conversion funnel.

    A user reaches stage i when their EARLIEST stage-i event is strictly
    after their earliest stage-(i-1) event (first-touch attribution;
    ties do not convert). One groupBy(user) with conditional MIN per
    stage — map-side partial agg, single shuffle — then a global agg of
    boolean flags. Output: one row, stage{i}_users plus conversion share
    of stage 0 (round 6).
    """
    firsts = events.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached = [F.col("t0").isNotNull()]
    for i in range(1, len(stages)):
        reached.append(
            reached[i - 1]
            & F.col(f"t{i}").isNotNull()
            & (F.col(f"t{i}") > F.col(f"t{i - 1}"))
        )
    counts = firsts.agg(
        *[
            F.sum(r.cast("long")).alias(f"stage{i}_users")
            for i, r in enumerate(reached)
        ]
    )
    # try_divide: a corpus where nobody reaches stage 0 yields NULL
    # shares instead of an ANSI-mode divide-by-zero job failure.
    shares = [
        F.round(
            F.try_divide(F.col(f"stage{i}_users"), F.col("stage0_users")), 6
        ).alias(f"stage{i}_share")
        for i in range(1, len(stages))
    ]
    return counts.select(
        *[F.col(f"stage{i}_users") for i in range(len(stages))], *shares
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-user event sequences.

    lead() over (user, ts, id) — id breaks ts ties deterministically —
    then a group count per (from, to) pair and a per-source share via a
    second tiny agg over O(types^2) rows. The window sort is the only
    data-sized shuffle; at 100 TB it is the same hash-partition on
    user_id every sessionizer already pays.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("next_type", F.lead(type_col).over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), "next_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    w_src = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        F.col("next_type").alias("to_type"),
        "transitions",
        F.round(
            F.col("transitions") / F.sum("transitions").over(w_src), 6
        ).alias("share_of_from"),
    ).orderBy("from_type", "to_type")
