"""General as-of join — the time-series lookup Spark has no native
operator for (reference has no time-series at all; this is part of the
engine's event-table surface alongside operators/sessions).

For each left row (key, t) attach the most recent right row (key, t_r)
with t_r <= t. Implemented as the union + ordered-window running-``last``
trick: both sides are tagged and unioned, one shuffle on the key sorts
each key's timeline, and a running last-non-null carries every right
value forward to the left rows that follow it. No range-join explosion,
no per-key driver loop — the same one-pass shape DuckDB/kdb execute
natively, expressed in Catalyst window form.

DuckDB's native ``ASOF JOIN`` is the correctness oracle
(__spark_entry__.oracle_sql: asof_join_generic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of (backward) join: latest right row with ts <= left ts.

    ``right`` should be unique per (on, right_ts) — pre-aggregate if not
    (ties would make the match non-deterministic). ``tolerance`` (same
    unit as the ts columns, which may be any orderable numeric) drops
    matches older than ``left_ts - tolerance``, like pandas merge_asof.
    Returns all left columns plus ``right_values`` (null when no match).
    """
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn("_tag", F.lit(1))
    r_tag = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_values],
        )
        .withColumn("_tag", F.lit(0))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # Right rows sort BEFORE left rows at equal ts (tag 0 < 1): ties match.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    carried = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in right_values}
    matched_ts = F.last(
        F.when(F.col("_tag") == 0, F.col("_ts")), ignorenulls=True
    ).over(w)
    for c, expr in carried.items():
        out = out.withColumn(c, expr)
    out = out.withColumn("_match_ts", matched_ts)
    out = out.filter(F.col("_tag") == 1)
    if tolerance is not None:
        stale = F.col("_match_ts") < (F.col("_ts") - F.lit(tolerance))
        for c in right_values:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.drop("_ts", "_tag", "_match_ts")
