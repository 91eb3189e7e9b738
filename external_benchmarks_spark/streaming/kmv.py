"""LIVE distinct/overlap sketch maintenance — the streaming twin of
operators/kmv.py, the same maintained-sketch shape as
streaming/qsketch.py (quantiles) and stream_heavy_hitters (CMS). The
bottom-k identity

    state := bottom_k(state | bottom_k(batch))

means the maintained state equals the batch sketch of everything seen
so far, so the stream's distinct estimates AND pairwise segment
overlaps are BIT-IDENTICAL to a batch run over the same rows (asserted
live in tests/test_kmv.py). State is hard-bounded at k rows per group
(driver-held between micro-batches — bounded by contract), so an
unbounded stream answers "how much does source X overlap source Y so
far" in O(G*k) memory with no state store and no watermark
bookkeeping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from external_benchmarks_spark.operators.kmv import (
    KMV_K,
    kmv_estimate,
    kmv_merge,
    kmv_pair_overlap,
    kmv_sketch,
)


class StreamingKMV:
    """foreachBatch accumulator: `update` folds each micro-batch's
    sketch into the bounded state; `estimate` / `pair_overlap` read the
    live answers back."""

    def __init__(
        self,
        spark: SparkSession,
        key_col: str,
        k: int = KMV_K,
        group_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.key_col = key_col
        self.k = k
        self.group_col = group_col
        self._state_rows: list | None = None
        self._schema = None

    def update(self, batch_df: DataFrame) -> None:
        s = kmv_sketch(
            batch_df, self.key_col, k=self.k, group_col=self.group_col
        )
        if self._state_rows is None:
            kept = s
        else:
            prev = self.spark.createDataFrame(self._state_rows, self._schema)
            kept = kmv_merge(prev, s, k=self.k, group_col=self.group_col)
        # bounded collect: <= k rows per group by construction
        rows = kept.collect()
        self._state_rows = rows
        self._schema = kept.schema

    def foreach_batch(self):
        return lambda batch_df, _bid: self.update(batch_df)

    def state_df(self) -> DataFrame:
        if self._state_rows is None:
            raise ValueError("no batches processed yet")
        return self.spark.createDataFrame(self._state_rows, self._schema)

    def estimate(self) -> DataFrame:
        return kmv_estimate(self.state_df(), k=self.k, group_col=self.group_col)

    def pair_overlap(self) -> DataFrame:
        if self.group_col is None:
            raise ValueError("pair_overlap needs a grouped sketch")
        return kmv_pair_overlap(self.state_df(), self.group_col, k=self.k)
