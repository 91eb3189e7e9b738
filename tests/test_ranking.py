"""Two-pass global ranking: equals the single-ORDER-BY spec, is a
permutation, is invariant to partition count, and never plans a
single-reducer window."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.ranking import global_rank


def _df(spark):
    rows = [(i, (i * 37) % 11) for i in range(200)]  # heavy key ties
    return spark.createDataFrame(rows, "id bigint, score bigint")


def test_global_rank_matches_spec(spark):
    df = _df(spark)
    got = {
        r.id: r.global_rank
        for r in global_rank(
            df, [F.col("score").desc(), F.col("id").asc()]
        ).collect()
    }
    want = {
        row_id: i + 1
        for i, (row_id, _s) in enumerate(
            sorted(((i, (i * 37) % 11) for i in range(200)),
                   key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want


def test_global_rank_partition_invariant(spark):
    df = _df(spark)
    a = sorted(
        tuple(r)
        for r in global_rank(
            df, [F.col("score").desc(), F.col("id")], num_partitions=3
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in global_rank(
            df, [F.col("score").desc(), F.col("id")], num_partitions=16
        ).collect()
    )
    assert a == b


def test_global_rank_window_is_partitioned(spark):
    """The whole point: the ranking window must be keyed by the range
    partition id, never a no-partition (single reducer) window."""
    df = _df(spark)
    out = global_rank(df, [F.col("score"), F.col("id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, line
