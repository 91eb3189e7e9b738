"""Z-order layout: Morton interleave correctness vs a bit-twiddling
reference, quantization bounds/degenerate cases, skip-stats semantics
(z beats linear on both-selective and y-only rectangles; linear wins
x-only), and the 1-row-broadcast bounds plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_interleave_matches_bit_twiddling_reference(spark):
    from external_benchmarks_spark.operators.zorder import interleave_expr

    pts = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pts, "qx bigint, qy bigint")
    got = {
        (r["qx"], r["qy"]): r["z"]
        for r in df.withColumn(
            "z", F.expr(interleave_expr("qx", "qy", 8))
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y, 8), (x, y)


def test_interleave_expr_dialects_agree():
    """The DuckDB dialect differs only by the division token."""
    import duckdb

    from external_benchmarks_spark.operators.zorder import interleave_expr

    e = interleave_expr("x", "y", 6, dialect="duckdb")
    con = duckdb.connect()
    for x, y in [(0, 0), (7, 9), (63, 1), (63, 63)]:
        got = con.execute(
            f"SELECT {e} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0]
        assert got == _morton_ref(x, y, 6)


def test_quantize_bounds_and_degenerate(spark):
    from external_benchmarks_spark.operators.zorder import with_zvalue

    df = spark.createDataFrame(
        [(10, 5), (20, 5), (30, 5)], "x bigint, y bigint"
    )
    rows = with_zvalue(df, "x", "y", bits=4).collect()
    qx = sorted(r["_qx"] for r in rows)
    # min -> 0, max -> 2^bits - 1, interior exact integer division
    assert qx == [0, 7, 15]
    # degenerate single-value column quantizes to rank 0 (no div-0)
    assert all(r["_qy"] == 0 for r in rows)


def test_skip_stats_zorder_wins_where_it_should(spark):
    """On a uniform 64x64 grid: z-order touches ~area buckets on the
    both-selective rect and ~sqrt-area on y-only; the linear layout
    reads EVERY bucket on y-only (its blind spot) and wins x-only."""
    from external_benchmarks_spark.operators.zorder import layout_skip_stats

    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    rows = {
        (r["strategy"], r["rect"]): r
        for r in layout_skip_stats(
            df, "x", "y", bits=6, n_buckets=64
        ).collect()
    }
    for (strategy, rect), r in rows.items():
        assert r["n_buckets"] == 64, (strategy, rect)
    # rows_matched identical across layouts (same predicate)
    for rect in ("both", "x_only", "y_only"):
        assert (
            rows[("zorder", rect)]["rows_matched"]
            == rows[("linear", rect)]["rows_matched"]
        )
    assert (
        rows[("zorder", "both")]["buckets_touched"]
        < rows[("linear", "both")]["buckets_touched"]
    )
    assert (
        rows[("zorder", "y_only")]["buckets_touched"]
        < rows[("linear", "y_only")]["buckets_touched"]
    )
    # linear reads everything when the leading column is unconstrained
    assert rows[("linear", "y_only")]["buckets_touched"] == 64
    # and wins its home case
    assert (
        rows[("linear", "x_only")]["buckets_touched"]
        <= rows[("zorder", "x_only")]["buckets_touched"]
    )


def test_bounds_join_is_broadcast_not_cartesian(spark, sf_dir):
    from external_benchmarks_spark.operators.zorder import with_zvalue

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = with_zvalue(
        orders, "o_custkey", "datediff(o_orderdate, DATE'1992-01-01')"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
