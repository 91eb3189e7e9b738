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


# ---------------------------------------------------------------------------
# Incremental maintenance (append_sorted_shards / sorted_layout_rows)
# ---------------------------------------------------------------------------


def _file_bytes(out, shard):
    d = os.path.join(out, f"shard={shard}")
    return {
        f: open(os.path.join(d, f), "rb").read()
        for f in sorted(os.listdir(d))
        if not f.startswith(("_", "."))
    }


def test_append_sorted_shards_matches_from_scratch(spark, sf_dir, tmp_path):
    """Two merge-appends into an 8-shard layout must yield EXACTLY the
    from-scratch total order (derived ranks equal row_number over the
    union), untouched shards stay byte-identical, and every shard keeps
    the one-sorted-file invariant."""
    from pyspark.sql.window import Window

    from external_benchmarks_spark.pipeline.export import (
        append_sorted_shards,
        sorted_layout_rows,
    )

    o = _orders(spark, sf_dir).drop("o_orderdate")
    base = o.filter(F.col("o_orderkey") % 10 < 8)
    cols = ["cents", "o_orderkey"]
    out = str(tmp_path / "layout")
    sharded = rank_sharded(base, [F.col(c) for c in cols], N_SHARDS)
    write_sorted_shards(sharded, [F.col(c) for c in cols], out)
    target = base.count() // N_SHARDS

    b1 = o.filter(F.col("o_orderkey") % 10 == 8)
    b2 = o.filter(F.col("o_orderkey") % 10 == 9)
    before = {s: _file_bytes(out, s) for s in range(N_SHARDS)}
    res1 = append_sorted_shards(spark, out, b1, cols, target_rows=target)
    assert res1["touched"]
    for s in range(N_SHARDS):
        if s not in res1["touched"]:
            assert _file_bytes(out, s) == before[s]  # never rewritten
    append_sorted_shards(spark, out, b2, cols, target_rows=target)

    got = sorted(
        (r.global_rank, r.cents, r.o_orderkey)
        for r in sorted_layout_rows(spark, out, cols).collect()
    )
    w = Window.orderBy("cents", "o_orderkey")
    want = sorted(
        (r.global_rank, r.cents, r.o_orderkey)
        for r in o.coalesce(1)
        .withColumn("global_rank", F.row_number().over(w).cast("bigint"))
        .collect()
    )
    assert got == want and len(got) == o.count()
    # one-sorted-file invariant holds for every shard dir
    for d in os.listdir(out):
        if d.startswith("shard="):
            files = [
                f
                for f in os.listdir(os.path.join(out, d))
                if not f.startswith(("_", "."))
            ]
            assert len(files) == 1, (d, files)


def test_append_splits_oversized_shard(spark, tmp_path):
    """A batch concentrated in one shard's key range pushes it past
    split_factor * target: the shard splits into ~target pieces under
    fresh ids, order and derived ranks stay exact."""
    from external_benchmarks_spark.pipeline.export import (
        append_sorted_shards,
        sorted_layout_rows,
    )

    base = spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k bigint, v bigint"
    )
    out = str(tmp_path / "layout")
    sharded = rank_sharded(base, [F.col("k")], 4)
    write_sorted_shards(sharded, [F.col("k")], out)
    # 100 rows concentrated inside shard 0's range [0, 25)
    batch = spark.range(100).select(
        (F.lit(10) + F.col("id") % 10).alias("k"),
        (F.col("id") + 1000).alias("v"),
    )
    res = append_sorted_shards(
        spark, out, batch, ["k", "v"], target_rows=25, split_factor=2
    )
    assert res["splits"], res  # shard 0 went 25 + 100 = 125 > 50
    got = [
        (r.global_rank, r.k, r.v)
        for r in sorted_layout_rows(spark, out, ["k", "v"])
        .orderBy("global_rank")
        .collect()
    ]
    union = base.select("k", "v").unionByName(batch.select("k", "v"))
    from pyspark.sql.window import Window

    want = [
        (r.global_rank, r.k, r.v)
        for r in union.coalesce(1)
        .withColumn(
            "global_rank",
            F.row_number().over(Window.orderBy("k", "v")).cast("bigint"),
        )
        .orderBy("global_rank")
        .collect()
    ]
    assert got == want
    # split pieces respect the one-file invariant and ~target sizing
    metas = {
        int(d.split("=")[1]): len(
            [
                f
                for f in os.listdir(os.path.join(out, d))
                if not f.startswith(("_", "."))
            ]
        )
        for d in os.listdir(out)
        if d.startswith("shard=")
    }
    assert all(v == 1 for v in metas.values())
    assert len(metas) > 4  # new shard ids exist


def test_append_rerun_and_crash_are_idempotent(spark, sf_dir, tmp_path):
    """The r10 advice hole: re-running an append after a crash used to
    double-insert into already-swapped shards. Now (1) an identical
    batch re-append is a ledger-skipped no-op, and (2) a crash inside
    the swap loop force-completes on the next read/append — final state
    equals the uninjured run's."""
    import pytest

    import external_benchmarks_spark.pipeline.export as ex
    from external_benchmarks_spark.pipeline.export import sorted_layout_rows
    from pyspark.sql.window import Window

    o = _orders(spark, sf_dir).drop("o_orderdate")
    base = o.filter(F.col("o_orderkey") % 10 < 8)
    cols = ["cents", "o_orderkey"]
    out = str(tmp_path / "layout")
    write_sorted_shards(
        rank_sharded(base, [F.col(c) for c in cols], N_SHARDS),
        [F.col(c) for c in cols],
        out,
    )
    target = base.count() // N_SHARDS

    b1 = o.filter(F.col("o_orderkey") % 10 == 8)
    res1 = ex.append_sorted_shards(spark, out, b1, cols, target_rows=target)
    assert res1["touched"]
    n_after = spark.read.parquet(out).count()
    # (1) rerunning the SAME batch is a no-op (content digest in ledger)
    res2 = ex.append_sorted_shards(spark, out, b1, cols, target_rows=target)
    assert res2["touched"] == [] and "skipped" in res2
    assert spark.read.parquet(out).count() == n_after

    # (2) crash mid-swap-loop on the next batch
    import external_benchmarks_spark.pipeline.layout as layout_mod

    b2 = o.filter(F.col("o_orderkey") % 10 == 9)
    calls = {"n": 0}
    orig = layout_mod.swap_partition_dir

    def crashy(root, name, staged):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected append crash")
        return orig(root, name, staged)

    layout_mod.swap_partition_dir = crashy
    try:
        with pytest.raises(RuntimeError, match="injected"):
            ex.append_sorted_shards(spark, out, b2, cols, target_rows=target)
    finally:
        layout_mod.swap_partition_dir = orig
    assert os.path.exists(os.path.join(out, ex._APPEND_JOURNAL))
    # rerun of the same batch: recovery completes the journaled apply,
    # then the ledger skips the batch — no double insert
    res3 = ex.append_sorted_shards(spark, out, b2, cols, target_rows=target)
    assert res3["touched"] == [] and "skipped" in res3
    got = sorted(
        (r.global_rank, r.cents, r.o_orderkey)
        for r in sorted_layout_rows(spark, out, cols).collect()
    )
    w = Window.orderBy("cents", "o_orderkey")
    want = sorted(
        (r.global_rank, r.cents, r.o_orderkey)
        for r in o.coalesce(1)
        .withColumn("global_rank", F.row_number().over(w).cast("bigint"))
        .collect()
    )
    assert got == want and len(got) == o.count()


def test_applied_ledger_horizon_matches_streaming(tmp_path):
    """r12 advice (low): the applied-appends ledger keeps 1024 batch ids
    (the streaming ledger's horizon) — at 64, a batch replayed after 64
    newer appends passed the idempotency gate and double-inserted."""
    from external_benchmarks_spark.pipeline.export import (
        _read_applied,
        _record_applied,
    )

    out = str(tmp_path / "layout")
    os.makedirs(out, exist_ok=True)
    for i in range(1100):
        _record_applied(out, f"b{i}")
    kept = _read_applied(out)
    assert len(kept) == 1024
    assert "b99" in kept and "b1099" in kept  # >64-horizon replay still gated
