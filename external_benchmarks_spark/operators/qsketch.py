"""Mergeable quantile sketch via bottom-k hash sampling — the ORDER-
statistics member of the sketch family (operators/sketch.py covers
counts: CMS heavy hitters, Misra-Gries, HLL distinct). A bottom-k
sample keeps the k rows whose md5(row key) is smallest; because

    bottom_k(A | B) = bottom_k(bottom_k(A) | bottom_k(B))

per-partition sketches merge losslessly, so at 100 TB the sample is
computed map-side and only k rows per group ever cross the shuffle
(the merge identity is unit-tested directly). The hash makes the
sample deterministic AND uniform (md5 over the unique row key is an
order-free pseudo-random permutation shared by both engines), so the
whole sketch — sampling, ranking, quantile picks — replays exactly in
DuckDB.

Quantile estimates take the sorted sample's value at 0-based index
``(n - 1) * p // 1000`` per per-mille p (floor rank, no
interpolation: the estimate is an actual data value, integer-exact
cross-engine). Error is uniform-sampling error (~1/sqrt(k) in rank
space); groups smaller than k are sampled in full and therefore
EXACT.

Plan shapes: the global sample is a TakeOrderedAndProject (the same
per-partition top-k the kmeans seed fix standardized — never a global
window); the grouped sample is one PARTITIONED window. Money columns
follow the house integer-cents device on the entry side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QSKETCH_K = 256


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    k: int = QSKETCH_K,
    group_col: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """The bottom-k sketch rows (original columns plus the `_hk` hash).
    Deterministic: ordered by md5 of the concatenated row key, tie-
    broken by the key columns themselves.

    ``salt`` is the few-groups scale lever for engines WITHOUT map-side
    window limits: with ``salt=S`` phase 1 windows over
    (group, xxhash64(keys) % S) — G*S partitions — and phase 2 merges
    the G*S partial sketches per group, moving only G*S*k rows through
    the second shuffle. The result is IDENTICAL by the bottom-k merge
    identity (tested), and deterministic because the salt is a key
    hash, not a partition id.

    MEASURED CAVEAT (Spark >= 3.5): Catalyst rewrites the bare grouped
    ``row_number() <= k`` into WindowGroupLimit(Partial) BEFORE the
    Exchange + (Final) after it — i.e. the optimizer already performs
    the map-side per-group top-k the salt was for, and only <= k rows
    per group PER INPUT PARTITION cross the shuffle. At 20M rows x 3
    groups on local[32] the plain grouped form measures 10.3 s vs the
    salted form's 12.0 s (identical output) — the salt's second
    shuffle is pure overhead here. Keep ``salt=None`` on Spark >= 3.5;
    the salted form remains the portable shape for engines without the
    rewrite."""
    hcol = F.md5(
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    )
    out = df.withColumn("_hk", hcol)
    if group_col is None:
        return out.orderBy("_hk", *key_cols).limit(k)
    if salt is not None:
        sc = F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in key_cols]),
            F.lit(salt),
        )
        w1 = Window.partitionBy(group_col, "_salt").orderBy(
            "_hk", *key_cols
        )
        out = (
            out.withColumn("_salt", sc)
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_salt")
        )
    w = Window.partitionBy(group_col).orderBy("_hk", *key_cols)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def merge_samples(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    k: int = QSKETCH_K,
    group_col: str | None = None,
) -> DataFrame:
    """Merge two sketches: bottom-k of the union (same order rule).
    Lossless by the bottom-k identity."""
    u = a.unionByName(b)
    if group_col is None:
        return u.orderBy("_hk", *key_cols).limit(k)
    w = Window.partitionBy(group_col).orderBy("_hk", *key_cols)
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def sample_quantiles(
    sample: DataFrame,
    value_col: str,
    ps: tuple[int, ...] = (250, 500, 750, 950),
    group_col: str | None = None,
) -> DataFrame:
    """(group?, p_mille, q_est) — the sorted sample's value at floor
    rank ``(n - 1) * p / 1000`` for each per-mille quantile p. Runs
    over the k-bounded sketch only; values tie-break by `_hk` so the
    pick is total-ordered and engine-exact."""
    keys = [group_col] if group_col else []
    w = Window.partitionBy(*keys).orderBy("_v", "_hk")
    ranked = (
        sample.select(*keys, F.col(value_col).alias("_v"), "_hk")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    )
    # One explode over the per-mille list instead of one UNION branch
    # per p: the union form re-planned the whole upstream sketch per
    # branch (4 FileScans / 4 Exchanges / 20 Windows for the default
    # ps at r15 — guide §1.2). A row emits once per p it is the floor-
    # rank pick for (rows can tie for several p at tiny n), exactly the
    # union's multiset; the rank arithmetic is the same expression with
    # p as the lambda variable.
    ps_list = ", ".join(f"{int(p)}L" for p in ps)  # BIGINT elements
    return ranked.select(
        *keys,
        F.expr(
            f"explode(filter(array({ps_list}),"
            " p -> _rn = cast((_n - 1) * p div 1000 as int) + 1))"
        ).alias("p_mille"),
        F.col("_v").alias("q_est"),
    )
