"""Sorted-shard export: deterministic range-partitioned TOTAL-ORDER
parquet shards — the last dataset-production step (round-8 verdict
item #6). Training pipelines want "the corpus, globally ordered by X,
in S equal shards, each shard internally sorted" (curriculum order,
dedup-then-pack order, reproducible eval splits).

The naive shapes both fail at 100 TB:

- ``orderBy(...).write`` funnels the corpus through a global sort
  whose output the writer consumes as ONE task stream per file —
  and Spark's ``repartitionByRange`` picks boundaries by SAMPLING, so
  two runs of the same job can cut different shards (non-reproducible
  artifacts).

This module instead applies the ``global_rank`` two-pass device to
writing: exact global rank (range partitions + per-partition window +
driver-side cumsum over #partitions integers), then shard id =
``(rank - 1) * n_shards DIV N`` — a DETERMINISTIC equal-split that
never depends on sampling — then one hash repartition on the shard id
(bounded reducers, no single-partition exchange) with
``sortWithinPartitions`` + ``partitionBy(shard)`` so each shard lands
as ONE internally-sorted parquet file.

Reproducibility contract: ``order_cols`` must be a total order over
the EXPORTED columns (append the row key; rows identical in every
exported column are interchangeable, so ties among them cannot change
any artifact). Shard boundaries, counts, and within-shard order are
then pure functions of the data — the registry entry hashes all three
against a DuckDB replay via ``shard_stats``.

``shard_stats``'s order fingerprint is ``SUM(global_rank * h16)`` per
shard with ``h16`` = the first 16 bits of md5 over the exported row.
SUM is commutative, so what the hash pins is the rank-to-row
ASSIGNMENT (the intended total order: any re-assignment of ranks
among two different rows changes it; re-assigning among identical
rows is a no-op by design) — not the physical byte order of the
written artifact. File-level order is certified separately by
re-reading the shard files positionally (tests/test_export.py's
pyarrow pass). The sum is overflow-safe to ~2^59 at the benchmark
scales (rank < 2^23, h16 < 2^16, shard rows < 2^20; at larger scale
reduce modulo a prime on both engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.ranking import global_rank_with_total


def rank_sharded(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    n_shards: int,
    rank_col: str = "global_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Append exact global rank and the deterministic equal-split shard
    id ``(rank - 1) * n_shards DIV N``. Two passes total: N comes free
    from global_rank's partition-count pass (no separate count scan);
    driver data is bounded by the partition count."""
    ranked, n = global_rank_with_total(df, order_cols, rank_col=rank_col)
    # ranks are >= 1, so floor-div == truncating div here (both engines)
    shard = F.floor(
        ((F.col(rank_col) - F.lit(1)) * F.lit(int(n_shards))) / F.lit(int(n))
    ).cast("int")
    return ranked.withColumn(shard_col, shard)


def write_sorted_shards(
    sharded: DataFrame,
    order_cols: Sequence[Column | str],
    out_path: str,
    shard_col: str = "shard",
) -> None:
    """Write each shard as ONE internally-sorted parquet file under
    ``shard=<i>/``. The only exchange is the bounded n_shards-way hash
    repartition; no global sort, no single-partition funnel."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    (
        sharded.repartition(F.col(shard_col))
        .sortWithinPartitions(F.col(shard_col), *cols)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(out_path)
    )


def shard_stats(
    sharded: DataFrame,
    hash_cols: Sequence[str],
    key_col: Column | str,
    rank_col: str = "global_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard fingerprint row: (shard, n_rows, rank_min, rank_max,
    key_min, key_max, order_hash). ``rank_max - rank_min + 1 ==
    n_rows`` certifies contiguity; ``order_hash`` pins the exact
    within-shard order (see module docstring). One map-side-combinable
    groupBy over the sharded frame."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h16 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    return sharded.groupBy(F.col(shard_col).cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(rank_col).alias("rank_min"),
        F.max(rank_col).alias("rank_max"),
        F.min(key).alias("key_min"),
        F.max(key).alias("key_max"),
        F.sum(F.col(rank_col) * h16).alias("order_hash"),
    )
