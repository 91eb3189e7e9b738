"""Range (interval) join: match points to [start, end] intervals.

Naive Spark plans this as BroadcastNestedLoopJoin (quadratic work); the
scalable form buckets the range dimension on a coarse grid: each interval
is exploded to the grid cells it covers, points map to one cell, and the
join runs as a plain equi-join on (key, cell) followed by the exact
BETWEEN filter. Work becomes O(points + intervals x avg_cells + true
matches) with an even shuffle key — the standard trick behind range-join
optimizations in warehouse engines.

``grid`` trades explosion factor against candidate precision: pick it
near the typical interval length so each interval covers O(1) cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    grid: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` AND ``start <= point <= end`` (inclusive).

    Both ts columns must be integral (micros/units); ``grid`` is the cell
    width in the same unit. Returns all point columns plus all interval
    columns except the key.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins")
    # Integer DIV (not float division): exact at any magnitude.
    p = points.withColumn("_cell", F.expr(f"{point_col} DIV {grid}"))
    iv = intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {grid}"), F.expr(f"{end_col} DIV {grid}")
            )
        ),
    )
    joined = p.join(iv, [on, "_cell"]).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_cell")
