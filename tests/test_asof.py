"""General as-of join: backward match, tie semantics, tolerance."""

from __future__ import annotations

from external_benchmarks_spark.operators.asof import asof_join


def _collect(df):
    return {r.k: (r.t, r.v) for r in df.collect()}


def test_asof_backward_match_and_ties(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 15), ("b", 7)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [("a", 5, "r5"), ("a", 12, "r12"), ("b", 99, "zzz")], ["k", "rt", "v"]
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", right_values=["v"])
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got == {
        ("a", 5): "r5",   # tie: right at equal ts matches
        ("a", 10): "r5",
        ("a", 15): "r12",
        ("b", 7): None,   # right row is in the future -> no match
    }


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("a", 100), ("a", 200)], ["k", "t"])
    right = spark.createDataFrame([("a", 90, 1.0)], ["k", "rt", "v"])
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        right_values=["v"], tolerance=50,
    )
    got = {r.t: r.v for r in out.collect()}
    assert got[100] == 1.0   # 10 behind, within tolerance
    assert got[200] is None  # 110 behind, stale
