"""Distributed prefix (running) aggregates and the 2D skyline built on
them — generalizing operators/ranking.py's two-pass total-order device
from ranks to any reassociable running aggregate.

``SUM(x) OVER (ORDER BY ...)`` with no PARTITION BY is the same
single-reducer trap as a global ``row_number()``: Spark plans one
window task holding the entire dataset. Running totals, cumulative
maxima, and skyline scans are everyday analytics (revenue-to-date,
high-water marks, Pareto fronts), so the engine needs the scale shape
once, as an operator:

1. ``repartitionByRange`` on the order key — contiguous key ranges,
   range-ordered partition ids;
2. aggregate each partition (one row per partition);
3. driver-side EXCLUSIVE prefix combine over #partitions values — the
   only driver data, bounded by the partition count, never by rows;
4. broadcast the per-partition offsets back and combine with a
   WITHIN-partition running window (keyed by partition id — normal
   parallelism).

Correct for any associative agg with the telescoping argument from
ranking.py: local running value + exclusive partition prefix equals
the global running value for ANY boundary placement, so the output is
deterministic even though RangePartitioner samples boundaries —
provided ``order_cols`` is a TOTAL order (callers append a unique
tiebreaker, same contract as global_rank).

The 2D skyline (maximize both axes) reduces to one grouped max plus
one EXCLUSIVE running max over the per-x table ordered by x
descending: a point survives iff its per-x max-y strictly exceeds the
running max-y of all strictly-greater x. No pairwise comparison ever
materializes — the oracle's NOT EXISTS self-join is O(n^2); this is
two shuffles.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_AGGS = {"sum": F.sum, "max": F.max, "min": F.min}


def prefix_agg(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    value_col: str,
    agg: str = "sum",
    out_col: str = "running",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running ``agg`` of ``value_col`` over the
    total order given by ``order_cols`` (include a unique tiebreaker).
    ``exclusive=True`` aggregates strictly-preceding rows only (NULL
    for the first row overall, and for ``sum`` an empty prefix is NULL
    too — callers coalesce to their identity if they want one). Two
    passes, no single-reducer window."""
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    fn = _AGGS[agg]
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    part = part.localCheckpoint()  # both passes read the SAME partitioning
    # pass 1: one aggregate row per partition -> exclusive prefix combine
    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid").agg(fn(value_col).alias("t")).collect()
    }
    offsets: dict[int, object] = {}
    acc: object = None
    for pid in sorted(totals):
        offsets[pid] = acc
        t = totals[pid]
        if acc is None:
            acc = t
        elif t is not None:
            acc = acc + t if agg == "sum" else (max if agg == "max" else min)(acc, t)
    val_type = dict(df.dtypes)[value_col]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            f"_pid int, _off {val_type}",
        )
    )
    # pass 2: running agg WITHIN each range partition (+ the offset)
    end = -1 if exclusive else Window.currentRow
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    loc = F.col("_loc")
    if agg == "sum":
        combined = (
            F.when(loc.isNull() & F.col("_off").isNull(), F.lit(None))
            .otherwise(
                F.coalesce(loc, F.lit(0)) + F.coalesce(F.col("_off"), F.lit(0))
            )
            .cast(val_type)
        )
    else:
        # greatest/least skip NULLs in Spark (NULL only if both are)
        pick = F.greatest if agg == "max" else F.least
        combined = pick(loc, F.col("_off"))
    return (
        part.withColumn("_loc", fn(value_col).over(w))
        .join(off_df, "_pid")
        .withColumn(out_col, combined)
        .drop("_pid", "_loc", "_off")
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows on the maximize-both Pareto front: no other row has
    (x' >= x AND y' >= y) with at least one strict. Duplicate copies
    of a frontier point all survive (neither dominates the other).

    Shape: groupBy(x) max(y) — one shuffle on x; exclusive running max
    over the per-x table ordered x DESC — the two-pass prefix device
    over a table already shrunk to |distinct x| rows; broadcast-or-
    shuffle join back on (x, y = per-x max). Never a pairwise
    comparison.
    """
    per_x = df.groupBy(x_col).agg(F.max(y_col).alias("_my"))
    pm = prefix_agg(
        per_x,
        [F.col(x_col).desc()],
        "_my",
        agg="max",
        out_col="_pm",
        exclusive=True,
        num_partitions=num_partitions,
    )
    # survives iff: best y at this x (join condition) AND strictly above
    # every larger-x row's y (exclusive running max; NULL = largest x)
    frontier = pm.filter(F.col("_pm").isNull() | (F.col("_my") > F.col("_pm")))
    return df.join(
        frontier.select(x_col, F.col("_my").alias(y_col)), [x_col, y_col]
    )
