"""Grid-bucketed range join must equal the naive BETWEEN join for any
grid width (bucketing is a physical detail, never semantic)."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.rangejoin import range_join


def _naive(points, intervals, on):
    return points.join(intervals, on).filter(
        (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
    )


def test_range_join_matches_naive_across_grids(spark):
    points = spark.createDataFrame(
        [("a", i, 10 * i) for i in range(50)] + [("b", 99, 123)],
        ["k", "pid", "t"],
    )
    intervals = spark.createDataFrame(
        [("a", 1, 15, 95), ("a", 2, 400, 401), ("a", 3, 0, 0), ("b", 4, 100, 200)],
        ["k", "iid", "s", "e"],
    )
    want = sorted(
        (r.pid, r.iid) for r in _naive(points, intervals, "k").collect()
    )
    for grid in (1, 7, 50, 1000):
        got = sorted(
            (r.pid, r.iid)
            for r in range_join(
                points, intervals, on="k", point_col="t",
                start_col="s", end_col="e", grid=grid,
            ).collect()
        )
        assert got == want, f"grid={grid}"


def test_range_join_no_duplicate_matches(spark):
    """An interval spanning many cells must still match each point once."""
    points = spark.createDataFrame([("a", 1, 500)], ["k", "pid", "t"])
    intervals = spark.createDataFrame([("a", 9, 0, 1000)], ["k", "iid", "s", "e"])
    out = range_join(
        points, intervals, on="k", point_col="t",
        start_col="s", end_col="e", grid=10,
    )
    assert out.count() == 1
