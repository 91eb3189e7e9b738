"""Total-order global ranking WITHOUT a single-reducer window — the
two-pass pattern every "rank the whole corpus" task needs at scale
(quality-ordered curation cuts, global top-p sampling cutoffs,
deterministic dataset ordering before packing).

A bare ``row_number() OVER (ORDER BY ...)`` moves the entire dataset
to ONE partition (Spark even warns: "No Partition Defined for Window
operation"). The scale shape instead: (1) ``repartitionByRange`` on
the order key — each partition holds a contiguous key range and
partition ids are range-ordered; (2) rank WITHIN each partition (a
keyed window, normal parallelism); (3) add each partition's exclusive
prefix count — a driver-side cumsum over #partitions integers (the
only driver data, bounded by the partition count, never rows).

Output is invariant to where the sampled range boundaries land: local
rank + offset telescopes to the unique global rank for any boundary
choice, so the result is deterministic even though RangePartitioner
picks boundaries by sampling — provided ``order_cols`` is a TOTAL
order (append a unique tiebreaker; the helper refuses otherwise only
by contract, it cannot check uniqueness cheaply).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based position in the total order given
    by ``order_cols`` (which must be a total order — include a unique
    key as the last tiebreaker). Two passes, no corpus-sized shuffle
    to a single task."""
    ranked, _ = global_rank_with_total(df, order_cols, rank_col, num_partitions)
    return ranked


def global_rank_with_total(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """`global_rank` plus the total row count — free from pass 1's
    per-partition counts, so callers that need N (shard assignment in
    pipeline/export.py) avoid a separate full scan."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # both passes must read the SAME partitioning (offsets from pass 1
    # only apply to pass 2 if the range boundaries are identical), so
    # the partitioned frame is checkpointed. eager=False: the counts
    # collect right below is the first action anyway, so it materializes
    # the checkpoint as a side effect — one job instead of two (r15).
    part = part.localCheckpoint(eager=False)
    # pass 1: per-partition counts -> exclusive prefix offsets (tiny)
    counts = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _off bigint"
        )
    )
    # pass 2: rank within each range partition, add the offset
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = (
        part.withColumn("_lr", F.row_number().over(w))
        .join(off_df, "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("bigint"))
        .drop("_pid", "_lr", "_off")
    )
    return ranked, acc
