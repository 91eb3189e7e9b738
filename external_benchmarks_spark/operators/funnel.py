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


def event_transitions_ranged(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """`event_transitions` for HOT-KEY streams — identical output,
    different shuffle geometry.

    The window form hash-partitions by user, so one user holding (say)
    38% of a 100 TB stream lands on ONE task — the straggler/OOM shape
    the Zipf ladder in SCALE.md measures. This form range-partitions by
    (user, ts, id): the range partitioner balances by VOLUME, splitting
    a hot user across as many partitions as its mass needs. Each
    partition counts its adjacent same-user pairs locally in one
    Arrow-batched pass with O(types^2) state; the only rows crossing
    task boundaries afterwards are one (first, last) boundary row per
    partition, stitched driver-side (numPartitions rows, not data).

    Per-user ordering across partitions is exactly the global
    (user, ts, id) sort order, so local-adjacent + boundary-stitch
    enumerates precisely the pairs lead() would — equality-tested
    against event_transitions on skewed fixtures.
    """
    import json

    import pandas as pd

    sel = events.select(user_col, ts_col, id_col, type_col)
    if num_partitions is None:
        num_partitions = sel.sparkSession.conf.get(
            "spark.sql.shuffle.partitions"
        )
        num_partitions = int(num_partitions)
    ordered = (
        sel.repartitionByRange(
            num_partitions, F.col(user_col), F.col(ts_col), F.col(id_col)
        )
        .sortWithinPartitions(user_col, ts_col, id_col)
        .withColumn("_pid", F.spark_partition_id())
    )

    out_schema = (
        "kind string, pid int, from_type string, to_type string, cnt bigint, "
        "user string"
    )

    def count_partition(batches):
        counts: dict[tuple[str, str], int] = {}
        prev_user = None
        prev_type = None
        first = None
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["_pid"].iloc[0])
            users = pdf[user_col].astype(str).tolist()
            types = pdf[type_col].tolist()
            if first is None:
                first = (users[0], types[0])
            for u, t in zip(users, types):
                if prev_user == u:
                    key = (prev_type, t)
                    counts[key] = counts.get(key, 0) + 1
                prev_user, prev_type = u, t
        rows = [
            ("pair", pid, f, t, c, None) for (f, t), c in counts.items()
        ]
        if first is not None:
            rows.append(("first", pid, first[1], None, 0, first[0]))
            rows.append(("last", pid, prev_type, None, 0, prev_user))
        yield pd.DataFrame(
            rows,
            columns=["kind", "pid", "from_type", "to_type", "cnt", "user"],
        )

    mixed = ordered.mapInPandas(count_partition, out_schema).cache()
    try:
        # Boundary stitch: 2 rows per non-empty partition reach the
        # driver — O(numPartitions), independent of data size.
        bounds = (
            mixed.where(F.col("kind") != "pair")
            .select("kind", "pid", "from_type", "user")
            .collect()
        )
        firsts = {r["pid"]: r for r in bounds if r["kind"] == "first"}
        lasts = {r["pid"]: r for r in bounds if r["kind"] == "last"}
        extra: dict[tuple[str, str], int] = {}
        pids = sorted(firsts)
        for prev_pid, next_pid in zip(pids, pids[1:]):
            last, nxt = lasts[prev_pid], firsts[next_pid]
            if last["user"] == nxt["user"]:
                key = (last["from_type"], nxt["from_type"])
                extra[key] = extra.get(key, 0) + 1
        spark = events.sparkSession
        pair_counts = mixed.where(F.col("kind") == "pair").select(
            "from_type", F.col("to_type"), F.col("cnt")
        )
        if extra:
            extra_df = spark.createDataFrame(
                [(f, t, c) for (f, t), c in extra.items()],
                "from_type string, to_type string, cnt bigint",
            )
            pair_counts = pair_counts.unionByName(extra_df)
        pairs = pair_counts.groupBy("from_type", "to_type").agg(
            F.sum("cnt").alias("transitions")
        )
        w_src = Window.partitionBy("from_type")
        return (
            pairs.select(
                "from_type",
                "to_type",
                "transitions",
                F.round(
                    F.col("transitions") / F.sum("transitions").over(w_src), 6
                ).alias("share_of_from"),
            )
            .orderBy("from_type", "to_type")
            .localCheckpoint(eager=True)
        )
    finally:
        mixed.unpersist()


def funnel_latency(
    events: DataFrame,
    stages: Sequence[str] = DEFAULT_STAGES,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Time-to-convert distribution per adjacent funnel stage pair.

    Same first-touch semantics as event_funnel (a user converts stage i
    only if every earlier hop converted, strictly increasing first
    timestamps); for converting users the hop delay is the exact
    integer microsecond difference of first-touch times. ONE corpus
    shuffle (the same conditional-MIN groupBy as the funnel), then the
    per-pair rows melt out of a single projection — an array-of-structs
    explode, NOT a UNION of filtered branches, which would replay the
    aggregation lineage once per stage pair. Output per pair:
    n_users, p50/p90 delay (interpolating percentile, round 6 — the
    exact_median cross-engine device) and integer-div mean.
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
    hops = F.array(
        *[
            F.when(
                reached[i],
                F.struct(
                    F.lit(f"{stages[i - 1]}->{stages[i]}").alias("stage_pair"),
                    (F.col(f"t{i}") - F.col(f"t{i - 1}")).alias("_d"),
                ),
            )
            for i in range(1, len(stages))
        ]
    )
    delays = (
        firsts.select(F.explode(hops).alias("h"))
        .filter(F.col("h").isNotNull())
        .select("h.stage_pair", "h._d")
    )
    return (
        delays.groupBy("stage_pair")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.expr("percentile(_d, 0.5)"), 6).alias("p50_delay_us"),
            F.round(F.expr("percentile(_d, 0.9)"), 6).alias("p90_delay_us"),
            F.expr("sum(_d) div count(1)").cast("bigint").alias("avg_delay_us"),
        )
        .orderBy("stage_pair")
    )
