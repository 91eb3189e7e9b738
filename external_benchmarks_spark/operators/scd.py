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
first normalized to one row per (key, ts) — by default the
lexicographically-least WHOLE ROW of the attribute tuple (explicit
ASC NULLS FIRST per attribute), so the surviving tuple always
corresponds to a real input row; the legacy ``collision="column"``
mode instead takes per-column MIN, which can synthesize a tuple
matching no input ((a1,b2)+(a2,b1) -> (min-a, min-b)). A row survives
iff it has no prevailing state at all
(a brand-new key's first update — even an all-NULL one — always opens
a version) or ANY attribute IS DISTINCT FROM its prevailing value (the
previous update in the batch, else the key's current row — tracked
with explicit has-prev/has-cur flags, never a COALESCE over attribute
values, so NULL attributes version correctly); both engines express
this with identical window + IS DISTINCT FROM semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _attr_list(attr_cols: str | Sequence[str]) -> list[str]:
    return [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)


def scd2_init(
    dim: DataFrame,
    key_col: str,
    attr_cols: str | Sequence[str],
    valid_from=0,
) -> DataFrame:
    """Open an initial current version for every dimension row.
    ``attr_cols`` is one column name or a sequence — real dimensions
    version a tuple of attributes."""
    return dim.select(
        key_col,
        *_attr_list(attr_cols),
        F.lit(valid_from).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: str | Sequence[str],
    ts_col: str,
    collision: str = "row",
) -> DataFrame:
    """Apply one batch of (key, ts, attrs...) updates to an SCD2 table
    (schema: key, attrs..., valid_from, valid_to, is_current). A batch
    may carry MANY changes per key — they chain into consecutive
    versions. Updates whose whole attribute tuple equals the prevailing
    one (per-key consecutive, or vs the current row for the first) are
    suppressed, so re-applying the same batch is a no-op on version
    count. A brand-new key's first update always opens a version, even
    when every attribute is NULL (no-prevailing-state is tracked with
    explicit flags, not inferred from attribute nullness). Returns the
    full new table.

    ``collision`` picks the same-(key, ts) normalization rule:

    - ``"row"`` (default): the lexicographically-least WHOLE ROW of
      the attribute tuple, compared attribute-by-attribute with
      explicit ASC NULLS FIRST — the surviving tuple is always a real
      input row (row-integrity-preserving, the defensible warehouse
      semantic). Explicit null placement (not struct MIN) keeps the
      rule engine-identical: Spark ``asc_nulls_first`` and SQL
      ``ASC NULLS FIRST`` agree everywhere.
    - ``"column"``: legacy per-column MIN over the tuple — still
      deterministic, but two colliding updates differing in two
      attributes merge to a tuple matching NO input row
      ((a1,b2)+(a2,b1) -> (min-a, min-b)), and SQL MIN skips NULLs.
    """
    if collision not in ("row", "column"):
        raise ValueError(f"collision must be 'row' or 'column', got {collision!r}")
    attrs = _attr_list(attr_cols)
    # The current slice feeds THREE of the output union's branches (the
    # prevailing-state join, the closed rows, the untouched rows) and
    # the result plan would otherwise recompute its upstream (often a
    # shuffle, e.g. a distinct building the dimension) once per branch.
    # A lazy localCheckpoint makes the branches share one materialized
    # copy — computed inside the first action, no extra job (r15).
    cur = current.filter(F.col("is_current")).localCheckpoint(eager=False)
    hist = current.filter(~F.col("is_current"))

    # one update per (key, ts): deterministic collision normalization
    uu = updates.select(
        F.col(key_col),
        F.col(ts_col).cast("bigint").alias("_ts"),
        *[F.col(c).alias(f"_a_{c}") for c in attrs],
    )
    if collision == "row":
        wn = Window.partitionBy(key_col, "_ts").orderBy(
            *[F.col(f"_a_{c}").asc_nulls_first() for c in attrs]
        )
        u = (
            uu.withColumn("_rn", F.row_number().over(wn))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        u = uu.groupBy(key_col, "_ts").agg(
            *[F.min(f"_a_{c}").alias(f"_a_{c}") for c in attrs]
        )
    u = u.join(
        cur.select(
            key_col,
            *[F.col(c).alias(f"_c_{c}") for c in attrs],
            F.col("valid_from").alias("_cur_from"),
            F.lit(True).alias("_has_cur"),
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
    # Null-safe change detection against the prevailing tuple. lag()
    # sees the pre-filter predecessor; within a run of equal tuples only
    # the first can survive and it is compared against the last distinct
    # tuple before the run, so the run collapses correctly. Whether a
    # prevailing state EXISTS is a flag (lag of a literal / the join
    # flag), never a COALESCE over attribute values — a NULL attribute
    # is a real prevailing value, and "no state at all" must keep the
    # row. Window columns materialize in a select first (window
    # functions can't live in a WHERE clause).
    u = u.withColumn("_has_prev", F.lag(F.lit(True)).over(w))
    for c in attrs:
        u = u.withColumn(f"_p_{c}", F.lag(f"_a_{c}").over(w))
    has_prevailing = F.coalesce(F.col("_has_prev"), F.col("_has_cur"), F.lit(False))
    changed = F.lit(False)
    for c in attrs:
        prevailing_c = F.when(
            F.col("_has_prev"), F.col(f"_p_{c}")
        ).otherwise(F.col(f"_c_{c}"))
        changed = changed | ~F.col(f"_a_{c}").eqNullSafe(prevailing_c)
    # kept feeds both the new-version rows and the first-change lookup
    # (which itself joins back twice); checkpoint it so the update
    # window chain — two windows + the current join — runs once per
    # apply, not once per consumer (r15).
    kept = u.filter(~has_prevailing | changed).select(
        key_col, "_ts", *[f"_a_{c}" for c in attrs]
    ).localCheckpoint(eager=False)

    w2 = Window.partitionBy(key_col).orderBy("_ts")
    new_rows = kept.select(
        key_col,
        *[F.col(f"_a_{c}").alias(c) for c in attrs],
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
            *attrs,
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


def scd2_lookup_asof(
    facts: DataFrame,
    scd: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """The NON-BROADCAST scale path for the point-in-time join: SCD2
    validity intervals are contiguous and non-overlapping per key (each
    ``valid_to`` equals the successor's ``valid_from``; the final
    version is open-ended), so "the version valid at ts" is exactly
    "the last version whose valid_from <= ts" — an as-of join
    (operators/asof.asof_join: one union + one keyed window, a single
    shuffle on the dimension key, no broadcast, no range condition).
    Result-identical to :func:`scd2_lookup` (inner semantics: facts
    before a key's first version drop), asserted bit-for-bit in
    tests/test_scd.py. Use this form when the versioned dimension is
    too large to broadcast.

    The version's attributes travel as ONE struct through the window's
    last(ignorenulls) — per-column carrying would resurrect an OLDER
    version's value wherever the matched version's attribute is
    genuinely NULL.

    Constraint: fact column names must not collide with the unpacked
    version columns (including ``valid_from``/``valid_to``). The
    unpack step is ``withColumn``, which would silently OVERWRITE a
    same-named fact column — where :func:`scd2_lookup` would surface
    the clash as duplicate output columns — so the two "result-
    identical" paths would diverge on such inputs; this path raises
    instead. Rename the fact column before the lookup.
    """
    from external_benchmarks_spark.operators.asof import asof_join

    ver_cols = [
        c
        for c in scd.columns
        if c not in (key_col, "is_current")
    ]
    clash = sorted(set(facts.columns) & set(ver_cols))
    if clash:
        raise ValueError(
            "scd2_lookup_asof: fact columns collide with version columns "
            f"{clash}; the struct unpack would silently overwrite them "
            "(scd2_lookup would emit duplicate columns instead). Rename "
            "the fact columns before the lookup."
        )
    packed = scd.select(
        key_col,
        F.col("valid_from").alias("_vf"),
        F.struct(*ver_cols).alias("_ver"),
    )
    out = asof_join(
        facts,
        packed,
        on=key_col,
        left_ts=ts_col,
        right_ts="_vf",
        right_values=["_ver"],
    )
    out = out.filter(F.col("_ver").isNotNull())
    for c in ver_cols:
        out = out.withColumn(c, F.col("_ver")[c])
    return out.drop("_ver")
