"""LIVE cohort-retention maintenance — the streaming twin of
operators/retention.py, completing the maintained-analytics family
(streaming/kmv.py distinct/overlap, streaming/qsketch.py quantiles,
stream_heavy_hitters counts; round-8 verdict item #8).

State is the distinct (user, week) activity set — NOT the event
stream: every micro-batch collapses to its distinct pairs before
merging, so state growth is bounded by |users| x calendar weeks (a
user contributes at most one row per week regardless of event volume).
The set-union merge is exact and order-free, so the live matrix is
BIT-IDENTICAL to a batch `cohort_retention` over the same rows — both
call the same `matrix_from_activity` reduction (asserted live in
tests/test_retention_stream.py).

State lives as a localCheckpoint'd DataFrame (executor block storage,
never driver rows — unlike the k-bounded sketches, the activity set is
data-sized-but-compressed, so it stays distributed); each merge is one
distinct() over state∪batch, map-side combinable on the (user, week)
key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.retention import (
    matrix_from_activity,
)


class StreamingRetention:
    """foreachBatch accumulator: `update` folds each micro-batch's
    distinct (user, week) pairs into the maintained activity set;
    `matrix` reads the live retention matrix back."""

    def __init__(
        self,
        spark: SparkSession,
        user_col: str = "user_id",
        ts_col: str = "ts",
    ) -> None:
        self.spark = spark
        self.user_col = user_col
        self.ts_col = ts_col
        self._state: DataFrame | None = None

    def update(self, batch_df: DataFrame) -> None:
        wk = F.date_trunc("week", F.col(self.ts_col))
        pairs = batch_df.select(
            F.col(self.user_col).alias("_u"), wk.alias("_wk")
        ).distinct()
        merged = (
            pairs
            if self._state is None
            else self._state.unionByName(pairs).distinct()
        )
        # materialize + truncate lineage so state never replays sources
        self._state = merged.localCheckpoint()

    def foreach_batch(self):
        return lambda batch_df, _bid: self.update(batch_df)

    def state_df(self) -> DataFrame:
        if self._state is None:
            raise ValueError("no batches processed yet")
        return self._state

    def matrix(self) -> DataFrame:
        return matrix_from_activity(self.state_df())
