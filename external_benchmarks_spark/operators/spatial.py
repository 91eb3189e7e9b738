"""Spatial radius self-join on a planar integer grid — the spatial
member of the exact-complete join family (setjoin: sets, fuzzyjoin:
strings, this: points). Classic grid-file / fixed-grid spatial
hashing: with cell size >= radius, two points within the radius land
in the same or an adjacent cell (the grid lemma), so expanding ONE
side to its forward HALF-neighborhood (self + 4 of the 8 neighbor
offsets — antisymmetric, so each unordered cell pair is examined
exactly once) and equi-joining on cell id is a COMPLETE candidate
generator; candidates verify through the exact integer squared
distance (dx^2 + dy^2 <= r^2 — no sqrt, no floats, bit-identical in
any engine).

100 TB shape: the expansion is a constant 5x on one side; the join
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
    # One side expands to its FORWARD half-neighborhood (r15): self plus
    # the 4 offsets {E, NW, N, NE}. The set is antisymmetric (for o != 0
    # exactly one of o/-o is in it), so every cross-cell pair is
    # generated exactly once — no id_a < id_b dedup discarding half the
    # join products after they were built, and the exploded side
    # shuffles 5/9 of the old bytes. Same-cell pairs (offset 0,0) still
    # dedup by id order; cross-cell pair order is restored with
    # least/greatest at emission (dist2 is symmetric). Output identical
    # to the old 3x3 form (property-tested against brute force).
    off = F.explode(
        F.expr(
            "array(struct(0 AS dx, 0 AS dy), struct(1 AS dx, 0 AS dy),"
            " struct(-1 AS dx, 1 AS dy), struct(0 AS dx, 1 AS dy),"
            " struct(1 AS dx, 1 AS dy))"
        )
    ).alias("_o")
    a = pts.select(
        "_id", "_x", "_y", cx.alias("_cx"), cy.alias("_cy")
    ).select("_id", "_x", "_y", "_cx", "_cy", off).select(
        F.col("_id").alias("_ida"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
        ((F.col("_o.dx") == 0) & (F.col("_o.dy") == 0)).alias("_self"),
    )
    b = pts.select(
        F.col("_id").alias("_idb"),
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
        .filter(~F.col("_self") | (F.col("_ida") < F.col("_idb")))
        .withColumn("dist2", d2.cast("bigint"))
        .filter(F.col("dist2") <= radius * radius)
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "dist2",
        )
    )
