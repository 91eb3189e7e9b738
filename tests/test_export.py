"""Sorted-shard export (pipeline/export.py): written files realize the
spec exactly (one internally-sorted file per shard, contiguous
boundaries, full-row coverage), the plan has no single-partition
funnel, and the artifact is deterministic across runs."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.pipeline.export import (
    rank_sharded,
    shard_stats,
    write_sorted_shards,
)

N_SHARDS = 8


def _orders(spark, sf_dir):
    return Catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias("cents"),
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
    )


def test_written_shards_realize_spec(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    order_cols = [F.col("cents"), F.col("o_orderkey")]
    sharded = rank_sharded(o, order_cols, N_SHARDS).persist()
    out = str(tmp_path / "shards")
    write_sorted_shards(sharded, order_cols, out)
    stats = {r.shard: r for r in shard_stats(
        sharded, ["o_orderkey", "cents", "o_orderdate"], "cents"
    ).collect()}
    sharded.unpersist()

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == N_SHARDS
    prev_max = None
    seen = []
    for d in dirs:
        shard = int(d.split("=")[1])
        files = [
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)  # ONE sorted file per shard
        t = pq.read_table(os.path.join(out, d, files[0]))
        keys = list(
            zip(t.column("cents").to_pylist(), t.column("o_orderkey").to_pylist())
        )
        assert keys == sorted(keys)  # file preserves within-shard order
        st = stats[shard]
        assert len(keys) == st.n_rows
        assert st.rank_max - st.rank_min + 1 == st.n_rows  # contiguous ranks
        assert keys[0][0] == st.key_min and keys[-1][0] == st.key_max
        if prev_max is not None:
            assert keys[0] >= prev_max  # shard boundaries are ordered
        prev_max = keys[-1]
        seen.extend(t.column("o_orderkey").to_pylist())
    # full coverage, nothing duplicated or dropped
    src = [r.o_orderkey for r in o.select("o_orderkey").collect()]
    assert sorted(seen) == sorted(src)


def test_no_single_partition_exchange(spark, sf_dir):
    o = _orders(spark, sf_dir)
    sharded = rank_sharded(o, [F.col("cents"), F.col("o_orderkey")], N_SHARDS)
    stats = shard_stats(sharded, ["o_orderkey", "cents", "o_orderdate"], "cents")
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # the write-side frame too (repartition on shard id, bounded reducers)
    wr = sharded.repartition(F.col("shard")).sortWithinPartitions(
        "shard", "cents", "o_orderkey"
    )
    wplan = wr._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in wplan, wplan


def test_deterministic_across_runs(spark, sf_dir):
    """Same data -> bit-identical stats on a second independent run
    (the repartitionByRange sampling inside global_rank cannot leak
    into the artifact: rank+offset telescopes over any boundaries)."""
    o = _orders(spark, sf_dir)
    cols = [F.col("cents"), F.col("o_orderkey")]
    a = sorted(
        tuple(r)
        for r in shard_stats(
            rank_sharded(o, cols, N_SHARDS),
            ["o_orderkey", "cents", "o_orderdate"],
            "cents",
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in shard_stats(
            rank_sharded(o, cols, N_SHARDS, rank_col="global_rank"),
            ["o_orderkey", "cents", "o_orderdate"],
            "cents",
        ).collect()
    )
    assert a == b


def test_shard_sizes_balanced(spark, sf_dir):
    o = _orders(spark, sf_dir)
    sharded = rank_sharded(o, [F.col("cents"), F.col("o_orderkey")], N_SHARDS)
    sizes = [
        r.n
        for r in sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) == N_SHARDS
    assert max(sizes) - min(sizes) <= 1  # exact equal split, never sampled
