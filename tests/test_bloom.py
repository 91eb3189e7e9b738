"""Bloom semi-join reduction: no false negatives, FPR near theory,
filter_fact superset semantics, and the pure-codegen probe plan (no
join, no shuffle on the fact side)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_no_false_negatives_and_fpr_near_theory(spark, sf_dir):
    from external_benchmarks_spark.operators.bloom import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_semi_stats,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    r = bloom_semi_stats(lineitem, dim, "l_orderkey", "o_orderkey").collect()[
        0
    ]
    # no false negatives: every exact match survives the bloom
    assert r["bloom_survivors"] >= r["exact_matches"]
    assert (
        r["false_positives"] == r["bloom_survivors"] - r["exact_matches"]
    )
    n = dim.select("o_orderkey").distinct().count()
    non_matching = r["fact_rows"] - r["exact_matches"]
    if non_matching > 200:
        fpr = r["false_positives"] / non_matching
        theory = (1 - math.exp(-BLOOM_K * n / BLOOM_BITS)) ** BLOOM_K
        # within 3x of theory (independence of the md5 slices)
        assert fpr <= max(3 * theory, 0.03), (fpr, theory)


def test_filter_fact_is_superset_of_semi_join(spark, sf_dir):
    from external_benchmarks_spark.operators.bloom import (
        bloom_build,
        bloom_filter_fact,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(dim, "o_orderkey").collect()
    }
    survivors = bloom_filter_fact(lineitem, "l_orderkey", words)
    exact = lineitem.join(
        dim.select("o_orderkey").distinct(),
        lineitem.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    # semi-join rows missing from the bloom survivors: must be zero
    missing = exact.join(
        survivors.select("l_orderkey", "l_linenumber").distinct(),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).count()
    assert missing == 0
    assert survivors.count() >= exact.count()


def test_probe_is_codegen_filter_no_join(spark, sf_dir):
    from external_benchmarks_spark.operators.bloom import (
        bloom_build,
        bloom_filter_fact,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(dim, "o_orderkey").collect()
    }
    plan = (
        bloom_filter_fact(lineitem, "l_orderkey", words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_small_bloom_degrades_gracefully(spark):
    """A deliberately undersized filter (m = 256 bits, many keys) still
    has zero false negatives — only the FPR suffers."""
    from external_benchmarks_spark.operators.bloom import bloom_semi_stats

    dim = spark.range(0, 200).withColumnRenamed("id", "k")
    fact = spark.range(0, 2000).withColumnRenamed("id", "k")
    r = bloom_semi_stats(fact, dim, "k", "k", m=256, k=2).collect()[0]
    assert r["exact_matches"] == 200
    assert r["bloom_survivors"] >= 200


def test_probe_runs_unchanged_in_structured_streaming(spark, sf_dir, tmp_path):
    """The probe is a stateless codegen filter, so the SAME expression
    runs as a streaming runtime filter: an availableNow file stream
    through bloom_filter_fact must keep exactly the batch survivors —
    bloom-reduced ingest with no state store and no shuffle."""
    from external_benchmarks_spark.operators.bloom import (
        bloom_build,
        bloom_filter_fact,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
        .limit(2000)
    )
    src = str(tmp_path / "fact_src")
    lineitem.write.parquet(src)
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(dim, "o_orderkey").collect()
    }
    batch = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_filter_fact(
            spark.read.parquet(src), "l_orderkey", words
        ).collect()
    )
    stream = spark.readStream.schema(
        "l_orderkey bigint, l_linenumber int"
    ).parquet(src)
    q = (
        bloom_filter_fact(stream, "l_orderkey", words)
        .writeStream.format("memory")
        .queryName("bloom_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in spark.sql("SELECT * FROM bloom_stream_out").collect()
    )
    assert got == batch
    assert len(got) > 0
