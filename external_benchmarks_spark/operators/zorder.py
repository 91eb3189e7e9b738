"""Z-order (Morton) data layout for multi-dimensional file skipping —
the standard lever for making a 100 TB table prunable on MORE than one
filter column. A linear sort gives perfect min/max pruning on its
leading column and none on any other; interleaving the bits of two
quantized dimensions gives every file a tight bounding BOX in both, so
a 2-d range predicate touches only the files whose box intersects it
(Delta Lake OPTIMIZE ZORDER, Databricks liquid clustering, and every
parquet reader's row-group stats pruning all rest on this property).

Everything here is exact integer arithmetic, engine-portable by
construction:

- Quantization: ``q = ((x - min) * (2^bits - 1)) div (max - min)`` —
  bounds come from a one-row aggregate broadcast-cross-joined back
  (no driver collect), and integer division truncates identically in
  Spark (`div`) and DuckDB (`//`).
- Interleaving avoids shift FUNCTIONS (Spark SQL has shiftleft but no
  ``<<`` operator; DuckDB the reverse) by div/mod arithmetic:
  ``z = sum_i ((qx div 2^i) % 2) * 2^(2i+1) + ((qy div 2^i) % 2) * 2^(2i)``
  unrolled to ``2*bits`` pure-codegen terms.
- Bucketing: ``bucket = (v * n_buckets) div space`` — an even spatial
  split (deterministic, not equal-count; production writes would
  follow with repartitionByRange on the z-value, which needs no
  correctness contract).

`layout_skip_stats` prices the two layouts against the same rectangle
query: per bucket it computes the bounding box actually realized by
the rows (exactly the min/max stats a parquet footer would carry) and
counts buckets whose box intersects the rectangle — the files a
pruning reader MUST touch. One groupBy per strategy; the scan is
touched twice (once per layout), everything else is bounded by
``n_buckets``. tools/zorder_skip.py measures the same effect
physically (parquet footers via pyarrow) at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_expr(qx: str, qy: str, bits: int, dialect: str = "spark") -> str:
    """Morton interleave of two ``bits``-bit non-negative integers as
    div/mod arithmetic — the identical expression text modulo the
    integer-division token (Spark ``div``, DuckDB ``//``)."""
    dv = "div" if dialect == "spark" else "//"
    terms = []
    for i in range(bits):
        terms.append(f"(({qx} {dv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({qy} {dv} {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def quantize_expr(x: str, mn: str, mx: str, bits: int, dialect: str = "spark") -> str:
    """``((x - min) * (2^bits - 1)) div (max - min)``, guarded for the
    degenerate single-value column (max = min -> rank 0)."""
    dv = "div" if dialect == "spark" else "//"
    return (
        f"(CASE WHEN ({mx}) = ({mn}) THEN 0 ELSE "
        f"(({x}) - ({mn})) * {(1 << bits) - 1} {dv} (({mx}) - ({mn})) END)"
    )


def with_zvalue(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    out_col: str = "zval",
) -> DataFrame:
    """Append quantized ranks (_qx, _qy) and the interleaved z-value.
    ``xcol``/``ycol`` must be integer expressions (cast dates to epoch
    days first). Bounds are a one-row aggregate broadcast back — the
    scan is touched twice (bounds + quantize), never collected."""
    bounds = df.agg(
        F.min(F.expr(xcol)).alias("_xmn"),
        F.max(F.expr(xcol)).alias("_xmx"),
        F.min(F.expr(ycol)).alias("_ymn"),
        F.max(F.expr(ycol)).alias("_ymx"),
    )
    out = df.crossJoin(F.broadcast(bounds))
    out = out.withColumn(
        "_qx",
        F.expr(quantize_expr(xcol, "_xmn", "_xmx", bits)).cast("bigint"),
    ).withColumn(
        "_qy",
        F.expr(quantize_expr(ycol, "_ymn", "_ymx", bits)).cast("bigint"),
    )
    return out.withColumn(
        out_col, F.expr(interleave_expr("_qx", "_qy", bits)).cast("bigint")
    )


# The three query shapes that characterize a layout: selective in both
# dims (z-order's home turf), selective only in the leading/linear dim
# (linear's best case), selective only in the SECOND dim (linear's
# blind spot — every file must be read). Bounds are eighths of the
# quantized range: (xlo8, xhi8, ylo8, yhi8).
DEFAULT_RECTS: tuple[tuple[str, tuple[int, int, int, int]], ...] = (
    ("both", (2, 3, 2, 3)),
    ("x_only", (2, 3, 0, 8)),
    ("y_only", (0, 8, 2, 3)),
)


def layout_skip_stats(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    n_buckets: int = 64,
    rects=DEFAULT_RECTS,
) -> DataFrame:
    """Compare file-skipping for 2-d rectangle queries under a z-order
    layout vs a linear (x-sorted) layout.

    Rectangles are data-derived deterministically from the quantized
    space: ``(a, b, c, d)`` selects ``qx in [R*a/8, R*b/8] and qy in
    [R*c/8, R*d/8]`` (R = 2^bits - 1, eighths by integer division —
    exact in both engines).

    Returns one row per (strategy, rect): (strategy, rect, n_buckets,
    buckets_touched, rows_matched) where buckets_touched counts buckets
    whose REALIZED per-bucket bounding box (exactly the min/max stats a
    parquet footer carries) intersects the rectangle — the files a
    pruning reader must read. One groupBy per strategy; every
    per-rectangle aggregate runs over the ``n_buckets``-bounded table."""
    r = (1 << bits) - 1
    zspace = 1 << (2 * bits)
    zdf = with_zvalue(df, xcol, ycol, bits)
    assigned = zdf.select(
        "_qx",
        "_qy",
        F.expr(f"cast(zval * {n_buckets} div {zspace} as bigint)").alias(
            "zbucket"
        ),
        F.expr(f"cast(_qx * {n_buckets} div {r + 1} as bigint)").alias(
            "lbucket"
        ),
    )

    out: DataFrame | None = None
    for bucket_col, name in (("zbucket", "zorder"), ("lbucket", "linear")):
        per = assigned.groupBy(bucket_col).agg(
            F.min("_qx").alias("bxmn"),
            F.max("_qx").alias("bxmx"),
            F.min("_qy").alias("bymn"),
            F.max("_qy").alias("bymx"),
            *[
                F.sum(
                    F.when(
                        F.col("_qx").between(r * a // 8, r * b // 8)
                        & F.col("_qy").between(r * c // 8, r * d // 8),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ).alias(f"hits_{rect_name}")
                for rect_name, (a, b, c, d) in rects
            ],
        )
        for rect_name, (a, b, c, d) in rects:
            xlo, xhi = r * a // 8, r * b // 8
            ylo, yhi = r * c // 8, r * d // 8
            row = per.agg(
                F.lit(name).alias("strategy"),
                F.lit(rect_name).alias("rect"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum(
                    F.when(
                        (F.col("bxmn") <= xhi)
                        & (F.col("bxmx") >= xlo)
                        & (F.col("bymn") <= yhi)
                        & (F.col("bymx") >= ylo),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ).alias("buckets_touched"),
                F.sum(f"hits_{rect_name}").alias("rows_matched"),
            )
            out = row if out is None else out.unionAll(row)
    return out
