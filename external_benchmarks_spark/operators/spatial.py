"""Spatial radius self-join on a planar integer grid — the spatial
member of the exact-complete join family (setjoin: sets, fuzzyjoin:
strings, this: points). Classic grid-file / fixed-grid spatial
hashing: with cell size >= radius, two points within the radius land
in the same or an adjacent cell (the grid lemma), so expanding ONE
side to its 3x3 cell neighborhood and equi-joining on cell id is a
COMPLETE candidate generator; candidates verify through the exact
integer squared distance (dx^2 + dy^2 <= r^2 — no sqrt, no floats,
bit-identical in any engine).

100 TB shape: the expansion is a constant 9x on one side; the join
buckets by cell (posting list = points per cell, set by the density x
cell-size product); verification is a codegen integer expression. All
equi-joins; no R-tree needed for the fixed-radius case, and the cell
size is the one knob (cell = radius keeps the neighborhood minimal).

Coordinates are caller-provided integers; for testdata (which has no
geo columns) the registry entry derives a deterministic synthetic
plane from md5 slices of the key — the house device for data-derived
constants — so both engines see the identical point set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_pairs(
    df: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 50_000,
) -> DataFrame:
    """All unordered point pairs (id_a < id_b) with squared Euclidean
    distance <= radius^2. Output: (id_a, id_b, dist2)."""
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    cx = F.expr(f"_x div {radius}")
    cy = F.expr(f"_y div {radius}")
    # one side expands to its 3x3 neighborhood; the other stays put
    off = F.explode(
        F.expr(
            "transform(sequence(0, 8), i ->"
            " struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy))"
        )
    ).alias("_o")
    a = pts.select(
        "_id", "_x", "_y", cx.alias("_cx"), cy.alias("_cy")
    ).select("_id", "_x", "_y", "_cx", "_cy", off).select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
    )
    b = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("_xb"),
        F.col("_y").alias("_yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    d2 = (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb")) + (
        F.col("_ya") - F.col("_yb")
    ) * (F.col("_ya") - F.col("_yb"))
    return (
        a.join(b, ["_cx", "_cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", d2.cast("bigint"))
        .filter(F.col("dist2") <= radius * radius)
        .select("id_a", "id_b", "dist2")
    )
