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


def test_streaming_maintenance_is_bit_identical_to_batch(spark, sf_dir, tmp_path):
    """Live maintenance: an availableNow file stream folded through
    StreamingQuantileSketch must end with EXACTLY the batch sketch's
    quantiles over the same rows — the merge identity makes streaming
    maintenance exact, not approximate-on-top-of-approximate."""
    import pyspark.sql.functions as F2

    from external_benchmarks_spark.operators.qsketch import (
        hash_sample,
        sample_quantiles,
    )
    from external_benchmarks_spark.streaming.qsketch import (
        StreamingQuantileSketch,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_returnflag", "l_orderkey", "l_linenumber",
            (F2.round(F2.col("l_extendedprice") * 100, 0).cast("bigint")).alias("cents"),
        )
        .limit(5000)
    )
    src = str(tmp_path / "li_src")
    # several files so the stream sees multiple batches worth of input
    li.repartition(6).write.parquet(src)

    keys = ["l_orderkey", "l_linenumber", "cents"]
    batch = sorted(
        tuple(r)
        for r in sample_quantiles(
            hash_sample(
                spark.read.parquet(src), keys, k=128,
                group_col="l_returnflag",
            ),
            "cents",
            group_col="l_returnflag",
        ).collect()
    )
    sk = StreamingQuantileSketch(
        spark, keys, k=128, group_col="l_returnflag"
    )
    stream = spark.readStream.schema(
        "l_returnflag string, l_orderkey bigint, l_linenumber int, cents bigint"
    ).option("maxFilesPerTrigger", 2).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sk.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in sk.quantiles("cents").collect()
    )
    assert got == batch
    # state is hard-bounded: <= k rows per group
    counts = (
        sk.state_df().groupBy("l_returnflag").count().collect()
    )
    assert all(r["count"] <= 128 for r in counts)
