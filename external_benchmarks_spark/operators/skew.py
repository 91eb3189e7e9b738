"""Skew-mitigation operators: salted two-phase aggregation and
replicated salted joins.

The reference's data is heavily skewed — Books is ~41% of every scale
(reference reports/summary_report.md:34-38) — so a naive groupBy/join on
the hot key funnels almost half the table through one reducer at 100 TB.
AQE (enabled in session.py) re-splits skewed partitions at runtime; these
operators are the *declarative* complement for the cases AQE can't fix
(single hot GROUP BY key; hot join key on two large tables), and they are
result-identical to the unsalted forms, which is what their DuckDB
oracles assert.

Salts are DETERMINISTIC (hash of a spread column, not rand()) so retries
and speculative tasks see stable assignments.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (final_name, source_col, kind) — kinds decomposable into partials whose
# re-aggregation is exact: the algebraic aggregate set.
AggSpec = tuple[str, str, str]
_KINDS = ("count", "sum", "min", "max", "avg")


def _salt(spread_col: str, n: int) -> Column:
    return F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n))


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[AggSpec],
    spread_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase (salted) groupBy: identical results, no hot reducer.

    Phase 1 groups by (keys + salt) — the hot key's rows split across
    ``n_salts`` reducers — phase 2 merges the tiny per-salt partials:
    count = sum of counts, sum = sum of sums, min/max = min/max of
    partials, avg = merged sum / merged count. Only algebraic aggregates
    are accepted; holistic ones (exact median) can't be salted this way.

    Spark's own map-side partial aggregation already does this per
    *partition*; salting additionally splits the *reduce* side, which is
    what saves the single hot key at cluster scale.
    """
    for name, _src, kind in aggs:
        if kind not in _KINDS:
            raise ValueError(f"agg {name!r}: kind {kind!r} not in {_KINDS}")

    partials: list[Column] = []
    finals: list[Column] = []
    for name, src, kind in aggs:
        if kind == "count":
            partials.append(F.count(F.lit(1)).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "sum":
            partials.append(F.sum(src).alias(f"_p_{name}"))
            finals.append(F.sum(f"_p_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(src).alias(f"_p_{name}"))
            finals.append(F.min(f"_p_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(src).alias(f"_p_{name}"))
            finals.append(F.max(f"_p_{name}").alias(name))
        elif kind == "avg":
            partials.append(F.sum(src).alias(f"_ps_{name}"))
            partials.append(F.count(src).alias(f"_pc_{name}"))
            finals.append(
                (F.sum(f"_ps_{name}") / F.sum(f"_pc_{name}")).alias(name)
            )
    phase1 = (
        df.withColumn("_salt", _salt(spread_col, n_salts))
        .groupBy(*keys, "_salt")
        .agg(*partials)
    )
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    spread_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Large-x-large equi-join that splits hot join keys across reducers.

    The left (skewed, larger) side gets a deterministic salt in
    [0, n_salts); the right side is replicated once per salt value
    (explode of a literal range — a narrow n_salts-x blowup of the
    SMALLER side only). Joining on (key, salt) spreads each hot key over
    n_salts reducers. Result-identical to ``left.join(right, on, how)``
    for inner/left joins.

    Use when both sides are too big to broadcast AND a few keys dominate
    (else prefer plain join + AQE skew handling — this trades right-side
    duplication for reducer balance).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l_salted = left.withColumn("_salt", _salt(spread_col, n_salts))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    joined = l_salted.join(r_replicated, [on, "_salt"], how)
    return joined.drop("_salt")


def detect_hot_keys(
    df: DataFrame,
    on: str,
    hot_ratio: float = 0.01,
    n_counters: int = 64,
) -> list[str]:
    """Heavy join keys as strings, in two bounded passes over ONE column.

    Pass 1: per-partition Misra-Gries (operators/sketch.mg_candidates)
    over the key column — a guaranteed SUPERSET of every key above the
    1/n_counters partition-frequency bound, with output bounded at
    n_counters x partitions rows regardless of key cardinality. Pass 2:
    one scan that exact-counts ONLY the candidates (non-candidates fold
    into a single null group, which also yields the total row count) —
    one tiny shuffle of at most |candidates|+1 groups. Keys whose share
    exceeds ``hot_ratio`` are returned (string form; matching casts both
    sides identically, so int/string keys compare exactly).

    Measured at sf0.1 the whole detection is ~2 column-scans; amortize
    it by passing the result to adaptive_salted_join(hot=...) across
    queries on the same table version.
    """
    from external_benchmarks_spark.operators.sketch import mg_candidates

    keyed = df.select(F.col(on).cast("string").alias("_k"))
    cand = [
        r["_k"]
        for r in mg_candidates(keyed, token_col="_k", n_counters=n_counters)
        .collect()
        if r["_k"] is not None
    ]
    if not cand:
        return []
    counts = (
        keyed.select(
            F.when(F.col("_k").isin(cand), F.col("_k")).alias("_k2")
        )
        .groupBy("_k2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(r["cnt"] for r in counts)
    return sorted(
        r["_k2"]
        for r in counts
        if r["_k2"] is not None and r["cnt"] >= hot_ratio * total
    )


def adaptive_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    spread_col: str,
    n_salts: int = 8,
    how: str = "inner",
    hot: Sequence[str] | None = None,
    hot_ratio: float = 0.01,
) -> DataFrame:
    """Hot-key-only salted join: salt ONLY detected heavy keys, join the
    rest plain, union the two disjoint halves.

    Blanket salting replicates the ENTIRE right side x n_salts — at the
    skew mix measured at sf0.1 that costs more than the skew it cures
    (bench r5: salted 1.74 s vs naive 1.41 s). Here the right side is
    replicated only for the hot keys (a handful of rows), the cold
    majority joins with zero overhead, and the hot rows still spread
    over n_salts reducers. Key equality makes the split exact: a
    hot-key left row can only match a hot-key right row, so the union
    of the two joins is result-identical to ``left.join(right, on,
    how)`` for inner/left (hash-oracled in __spark_entry__).

    Pass ``hot`` (strings, as from detect_hot_keys) to skip detection —
    the production shape, where the hot set is computed once per table
    version. With hot=None, detection adds the two bounded passes of
    detect_hot_keys. An empty hot set degrades to exactly the plain
    join (no split, no union branch with zero partitions to plan).
    """
    if how not in ("inner", "left"):
        raise ValueError("adaptive_salted_join supports inner/left joins")
    if hot is None:
        hot = detect_hot_keys(left, on, hot_ratio=hot_ratio)
    hot = list(hot)
    if not hot:
        return left.join(right, on, how)
    is_hot = F.col(on).cast("string").isin(hot)
    hot_part = salted_join(
        left.filter(is_hot), right.filter(is_hot), on, spread_col,
        n_salts=n_salts, how=how,
    )
    # Hot right rows can never equal a cold left key, so pruning them
    # from the cold branch only cuts shuffle volume; null right keys
    # match nothing under inner/left and are safe to drop with them.
    cold_part = left.filter(~is_hot | F.col(on).isNull()).join(
        right.filter(~is_hot), on, how
    )
    return hot_part.unionByName(cold_part)
