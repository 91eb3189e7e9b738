"""Bottom-k hash-sample quantile sketch: the lossless merge identity,
partition invariance, small-group exactness, estimate accuracy, and
the TakeOrderedAndProject plan shape for the global form."""

from __future__ import annotations

import pyspark.sql.functions as F


def _vals(spark, n=5000, parts=8):
    return (
        spark.range(0, n, 1, parts)
        .select(F.col("id"), (F.col("id") * 37 % n).alias("v"))
    )


def test_merge_identity_is_lossless(spark):
    """bottom_k(A | B) == bottom_k(bottom_k(A) | bottom_k(B)) — the
    property that lets per-partition sketches merge at any depth."""
    from external_benchmarks_spark.operators.qsketch import (
        hash_sample,
        merge_samples,
    )

    df = _vals(spark)
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)
    direct = sorted(
        (r["id"], r["v"]) for r in hash_sample(df, ["id"], k=64).collect()
    )
    merged = sorted(
        (r["id"], r["v"])
        for r in merge_samples(
            hash_sample(a, ["id"], k=64),
            hash_sample(b, ["id"], k=64),
            ["id"],
            k=64,
        ).collect()
    )
    assert merged == direct


def test_partition_invariance(spark):
    from external_benchmarks_spark.operators.qsketch import hash_sample

    df = _vals(spark)
    s1 = sorted(r["id"] for r in hash_sample(df, ["id"], k=64).collect())
    s2 = sorted(
        r["id"]
        for r in hash_sample(df.repartition(13), ["id"], k=64).collect()
    )
    assert s1 == s2


def test_small_group_is_exact_and_estimate_is_close(spark):
    from external_benchmarks_spark.operators.qsketch import (
        hash_sample,
        sample_quantiles,
    )

    n = 5000
    df = _vals(spark, n=n).withColumn("g", F.lit("all"))
    # k >= n: the sample is the full data, the median is exact
    s_full = hash_sample(df, ["id"], k=n, group_col="g")
    q_full = {
        r["p_mille"]: r["q_est"]
        for r in sample_quantiles(s_full, "v", group_col="g").collect()
    }
    assert q_full[500] == (n - 1) * 500 // 1000  # v is a permutation of 0..n-1
    # k << n: estimates within ~3/sqrt(k) of the true rank
    s = hash_sample(df, ["id"], k=256, group_col="g")
    q = {
        r["p_mille"]: r["q_est"]
        for r in sample_quantiles(s, "v", group_col="g").collect()
    }
    for p in (250, 500, 750, 950):
        true = (n - 1) * p // 1000
        assert abs(q[p] - true) < n * 3 / (256 ** 0.5), (p, q[p], true)


def test_global_sample_plans_take_ordered(spark, sf_dir):
    from external_benchmarks_spark.operators.qsketch import hash_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        hash_sample(li, ["l_orderkey", "l_linenumber"], k=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_grouped_window_is_partitioned(spark, sf_dir):
    from external_benchmarks_spark.operators.qsketch import hash_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = (
        hash_sample(
            li,
            ["l_orderkey", "l_linenumber"],
            k=256,
            group_col="l_returnflag",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_salted_two_phase_equals_bare_grouped(spark, sf_dir):
    """The few-groups scale form (salted phase-1 windows + per-group
    merge) returns exactly the bare grouped sketch, by the bottom-k
    merge identity, and its first window partitions on (group, salt)."""
    from external_benchmarks_spark.operators.qsketch import hash_sample

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = ["l_orderkey", "l_linenumber", "l_extendedprice"]
    bare = sorted(
        (r["l_returnflag"], r["_hk"])
        for r in hash_sample(
            li, keys, k=128, group_col="l_returnflag"
        ).collect()
    )
    salted_df = hash_sample(
        li, keys, k=128, group_col="l_returnflag", salt=16
    )
    salted = sorted(
        (r["l_returnflag"], r["_hk"]) for r in salted_df.collect()
    )
    assert salted == bare
    plan = salted_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "_salt" in plan
