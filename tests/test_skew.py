"""Skew operators must be result-identical to their unsalted forms and
must actually spread the hot key across salts."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.operators.skew import _salt, salted_groupby, salted_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_groupby_matches_plain(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    salted = salted_groupby(
        docs,
        keys=["lang"],
        aggs=[
            ("cnt", "doc_id", "count"),
            ("sum_chars", "n_chars", "sum"),
            ("min_chars", "n_chars", "min"),
            ("max_chars", "n_chars", "max"),
            ("avg_chars", "n_chars", "avg"),
        ],
        spread_col="doc_id",
        n_salts=16,
    )
    plain = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars") / F.count("n_chars")).alias("avg_chars"),
    )
    assert _rows(salted) == _rows(plain)


def test_salted_groupby_spreads_hot_key(spark, sf_dir):
    """The hot key's rows must land in many distinct salt groups."""
    docs = Catalog(spark, sf_dir).documents
    hot = (
        docs.groupBy("lang").count().orderBy(F.desc("count")).limit(1).collect()[0].lang
    )
    n = (
        docs.filter(F.col("lang") == hot)
        .select(_salt("doc_id", 16).alias("s"))
        .distinct()
        .count()
    )
    assert n >= 12  # ~uniform over 16 salts


def test_salted_join_matches_plain_inner(spark, sf_dir):
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_partkey", "l_extendedprice")
    orders = cat.orders.withColumnRenamed("o_orderkey", "l_orderkey").select(
        "l_orderkey", "o_orderpriority"
    )
    salted = salted_join(li, orders, on="l_orderkey", spread_col="l_partkey", n_salts=4)
    plain = li.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    a = _rows(salted.groupBy("o_orderpriority").count())
    b = _rows(plain.groupBy("o_orderpriority").count())
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "r1")], ["k", "r"])
    out = salted_join(left, right, on="k", spread_col="v", n_salts=4, how="left")
    rows = {(r.k, r.r) for r in out.collect()}
    assert rows == {(1, "r1"), (2, None), (3, None)}


def test_detect_hot_keys_finds_zipf_head(spark):
    """The MG+exact-count detector surfaces exactly the keys above the
    ratio threshold on a 41%-hot mix, and nothing from the uniform
    tail."""
    from external_benchmarks_spark.operators.skew import detect_hot_keys

    left = spark.range(100_000).select(
        F.when(F.col("id") % 100 < 41, F.lit(0))
        .otherwise((F.col("id") % 997) + 1)
        .cast("long")
        .alias("k")
    )
    hot = detect_hot_keys(left, "k", hot_ratio=0.05)
    assert hot == ["0"]


def test_adaptive_join_matches_plain(spark, sf_dir):
    """Hot-key-only salting is result-identical to the plain join, with
    detection on, with an explicit hot set, and with an empty hot set
    (pure passthrough)."""
    from external_benchmarks_spark.operators.skew import adaptive_salted_join

    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.select("l_orderkey", "l_partkey", "l_extendedprice")
    orders = cat.orders.withColumnRenamed("o_orderkey", "l_orderkey").select(
        "l_orderkey", "o_orderpriority"
    )
    plain = _rows(
        li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    )
    some_keys = [
        str(r["l_orderkey"]) for r in li.select("l_orderkey").distinct().limit(5).collect()
    ]
    for hot in (None, some_keys, []):
        out = adaptive_salted_join(
            li, orders, on="l_orderkey", spread_col="l_partkey",
            n_salts=4, hot=hot, hot_ratio=0.0001,
        )
        assert _rows(out.groupBy("o_orderpriority").count()) == plain, hot


def test_adaptive_join_left_keeps_unmatched_and_nulls(spark):
    from external_benchmarks_spark.operators.skew import adaptive_salted_join

    left = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z"), (None, "n")], "k bigint, v string"
    )
    right = spark.createDataFrame([(1, "r1"), (9, "r9")], "k bigint, r string")
    out = adaptive_salted_join(
        left, right, on="k", spread_col="v", n_salts=4, how="left", hot=["1"]
    )
    rows = {(r.k, r.r) for r in out.collect()}
    assert rows == {(1, "r1"), (2, None), (3, None), (None, None)}
    inner = adaptive_salted_join(
        left, right, on="k", spread_col="v", n_salts=4, hot=["1"]
    )
    assert {(r.k, r.r) for r in inner.collect()} == {(1, "r1")}


def test_aqe_skew_join_splits_hot_partition(spark):
    """With broadcast disabled and tiny skew thresholds, AQE must detect
    the hot key's shuffle partition and split it (skew=true in the final
    adaptive plan) — the runtime half of the skew story (the salted
    operators are the planning-time half)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
    ]
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # pad must be NON-FOLDABLE and kept in the output: a literal would
        # be constant-folded past the shuffle (column pruning), shrinking
        # the hot partition below the skew threshold.
        left = spark.range(50_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(0))
            .otherwise(F.col("id") % 500)
            .cast("long")
            .alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(500).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k").select("k", "pad", "rv")
        assert len(j.collect()) == 50_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_balances_reducers(spark):
    """Load-independent skew evidence: after hash-partitioning on the join
    key, the 41%-hot key owns ~41% of one reducer's rows; partitioning on
    (key, salt) caps every reducer near uniform. This is the balance the
    wall-clock bench pair (bench.py skew_join_naive/salted) buys."""
    n, parts = 100_000, 16
    left = spark.range(n).select(
        F.when(F.col("id") % 100 < 41, F.lit(0))
        .otherwise((F.col("id") % 997) + 1)
        .cast("long")
        .alias("k"),
        F.col("id").cast("string").alias("pad"),
    )

    def max_partition_rows(df):
        rows = (
            df.select(F.spark_partition_id().alias("p"))
            .groupBy("p")
            .count()
            .collect()
        )
        return max(r["count"] for r in rows)

    naive = max_partition_rows(left.repartition(parts, "k"))
    salted = max_partition_rows(
        left.withColumn("_salt", _salt("pad", parts)).repartition(parts, "k", "_salt")
    )
    assert naive >= 0.41 * n  # the hot key serializes on one reducer
    assert salted <= 0.15 * n  # salt caps the hot reducer near uniform
