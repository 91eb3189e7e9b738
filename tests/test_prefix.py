"""Distributed prefix aggregates: equal the single-ORDER-BY spec,
partition-count invariant, never plan an unpartitioned window; skyline
equals the O(n^2) dominance spec including duplicate frontier points."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.prefix import prefix_agg, skyline_2d


def _df(spark):
    rows = [(i, (i * 37) % 11, (i * 53) % 97) for i in range(200)]
    return spark.createDataFrame(rows, "id bigint, grp bigint, v bigint")


def _spec(rows, agg, exclusive):
    out = {}
    acc = None
    for rid, _g, v in rows:
        out[rid] = acc if exclusive else (
            v if acc is None else (acc + v if agg == "sum" else max(acc, v))
        )
        acc = v if acc is None else (acc + v if agg == "sum" else max(acc, v))
    return out


def test_prefix_sum_matches_spec(spark):
    df = _df(spark)
    got = {
        r.id: r.running
        for r in prefix_agg(df, ["grp", "id"], "v", num_partitions=7).collect()
    }
    rows = sorted(((i, (i * 37) % 11, (i * 53) % 97) for i in range(200)),
                  key=lambda t: (t[1], t[0]))
    assert got == _spec(rows, "sum", exclusive=False)


def test_prefix_max_exclusive_matches_spec(spark):
    df = _df(spark)
    got = {
        r.id: r.running
        for r in prefix_agg(
            df, [F.col("grp").desc(), "id"], "v",
            agg="max", exclusive=True, num_partitions=5,
        ).collect()
    }
    rows = sorted(((i, (i * 37) % 11, (i * 53) % 97) for i in range(200)),
                  key=lambda t: (-t[1], t[0]))
    assert got == _spec(rows, "max", exclusive=True)
    # first row of the total order has an empty prefix
    first = min(rows, key=lambda t: (-t[1], t[0]))
    assert got[first[0]] is None


def test_prefix_partition_invariant(spark):
    df = _df(spark)
    a = sorted(
        (r.id, r.running)
        for r in prefix_agg(df, ["v", "id"], "grp", num_partitions=2).collect()
    )
    b = sorted(
        (r.id, r.running)
        for r in prefix_agg(df, ["v", "id"], "grp", num_partitions=16).collect()
    )
    assert a == b


def test_prefix_window_is_partitioned(spark):
    df = _df(spark)
    out = prefix_agg(df, ["grp", "id"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "sum(" in line:
            assert "_pid" in line, line


def test_skyline_matches_dominance_spec(spark):
    # includes duplicate frontier points and same-x columns
    pts = [(1, 5), (1, 5), (2, 4), (2, 3), (3, 1), (0, 9), (3, 1), (5, 0),
           (4, 1), (2, 4)]
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id int, x int, y int"
    )
    got = sorted((r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    want = sorted(
        (i, x, y)
        for i, (x, y) in enumerate(pts)
        if not any(
            xx >= x and yy >= y and (xx > x or yy > y) for (xx, yy) in pts
        )
    )
    assert got == want
    # both copies of duplicate frontier points survive
    assert [p for p in got if (p[1], p[2]) == (1, 5)] == [(0, 1, 5), (1, 1, 5)]
