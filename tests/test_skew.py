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
