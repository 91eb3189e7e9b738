"""Slowly-changing-dimension Type 2 maintenance (Kimball's validity-
interval versioning): attribute changes close the current version row
(``valid_to`` = successor's ``valid_from``) and open a new one; history
is never rewritten.

Spark shape: one batch of updates applies with two windows over the
UPDATES (per-key ts ordering for consecutive-duplicate suppression and
valid_to chaining) plus one key-equi join against the current slice —
shuffles partition by the dimension key, history rows are untouched
pass-through, and nothing is ever collected. At 100 TB the dimension
is the small side; the same plan holds with the updates as a stream of
micro-batches (each batch is one application of ``scd2_apply``).

Determinism (what makes the whole merge hash-oracle-able): updates are
first normalized to one row per (key, ts) by MIN(attr); a row survives
iff its attr IS DISTINCT FROM its predecessor (the previous surviving
update, or the key's current attribute for the first update —
null-safe, so NULL attrs version correctly); both engines express this
with identical window + IS DISTINCT FROM semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_init(
    dim: DataFrame,
    key_col: str,
    attr_col: str,
    valid_from=0,
) -> DataFrame:
    """Open an initial current version for every dimension row."""
    return dim.select(
        key_col,
        attr_col,
        F.lit(valid_from).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
) -> DataFrame:
    """Apply one batch of (key, ts, attr) updates to an SCD2 table
    (schema: key, attr, valid_from, valid_to, is_current). A batch may
    carry MANY changes per key — they chain into consecutive versions.
    Updates equal to the prevailing attribute (per-key consecutive, or
    vs the current row for the first) are suppressed, so re-applying
    the same batch is a no-op on version count. Returns the full new
    table.
    """
    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))

    # one update per (key, ts): deterministic MIN(attr)
    u = updates.groupBy(
        F.col(key_col), F.col(ts_col).cast("bigint").alias("_ts")
    ).agg(F.min(attr_col).alias("_attr"))
    u = u.join(
        cur.select(
            key_col,
            F.col(attr_col).alias("_cur_attr"),
            F.col("valid_from").alias("_cur_from"),
        ),
        key_col,
        "left",
    )
    # Late/replayed updates: anything at or before the current version's
    # valid_from already happened — ignore it. This is what makes
    # re-applying a batch a no-op. New keys (no current row) accept any
    # ts.
    u = u.filter(
        F.col("_ts") > F.coalesce(F.col("_cur_from"), F.col("_ts") - 1)
    )
    w = Window.partitionBy(key_col).orderBy("_ts")
    # IS DISTINCT FROM: null-safe change detection. NOTE: lag() sees the
    # pre-filter predecessor; within a run of equal attrs only the first
    # can survive and it is compared against the last distinct value
    # before the run, so the run collapses correctly. The window column
    # materializes in a select first (window functions can't live in a
    # WHERE clause).
    kept = (
        u.withColumn(
            "_prevailing",
            F.coalesce(F.lag("_attr").over(w), F.col("_cur_attr")),
        )
        .filter(~F.col("_attr").eqNullSafe(F.col("_prevailing")))
        .drop("_prevailing")
    )

    w2 = Window.partitionBy(key_col).orderBy("_ts")
    new_rows = kept.select(
        key_col,
        F.col("_attr").alias(attr_col),
        F.col("_ts").alias("valid_from"),
        F.lead("_ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())

    first_change = kept.groupBy(key_col).agg(
        F.min("_ts").alias("_close_ts")
    )
    closed = (
        cur.join(first_change, key_col, "inner")
        .select(
            key_col,
            attr_col,
            "valid_from",
            F.col("_close_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    unchanged_cur = cur.join(first_change, key_col, "left_anti")
    return (
        hist.unionByName(unchanged_cur)
        .unionByName(closed)
        .unionByName(new_rows)
    )


def scd2_lookup(
    facts: DataFrame,
    scd: DataFrame,
    key_col: str,
    ts_col: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks up the
    dimension version valid at its timestamp
    (``valid_from <= ts`` and ``ts < valid_to`` with open-ended current
    versions). Inner join — facts before a key's first version drop;
    use an 'init' epoch-0 version (scd2_init) to cover all history.

    Scale shape: dimensions are the small side, so the default is a
    broadcast range join (no shuffle of the facts). For a dimension too
    large to broadcast, set ``broadcast_dim=False`` and let AQE/sort-
    merge handle it, or reduce to an as-of join on ``valid_from``
    (operators/asof) — SCD2 intervals are non-overlapping per key, so
    "last version starting at or before ts" is equivalent.
    """
    dim = scd.withColumnRenamed(key_col, "_dim_key")
    if broadcast_dim:
        dim = F.broadcast(dim)
    ts = facts[ts_col]
    cond = (
        (facts[key_col] == dim["_dim_key"])
        & (dim["valid_from"] <= ts)
        & (dim["valid_to"].isNull() | (ts < dim["valid_to"]))
    )
    return facts.join(dim, cond, "inner").drop("_dim_key")
