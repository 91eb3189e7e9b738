"""LIVE quantile-sketch maintenance — the streaming twin of
operators/qsketch.py, the same shape as the other maintained sketches
(stream_heavy_hitters keeps a CMS live; this keeps the bottom-k hash
sample live). Mergeable sketches are exactly what makes streaming
maintenance trivial and EXACT: per micro-batch, sketch the batch and
merge into the accumulated state —

    state := bottom_k(state | bottom_k(batch))

which by the bottom-k identity equals the batch sketch of everything
seen so far, so the stream's quantile estimates are BIT-IDENTICAL to
a batch run over the same data (asserted live in
tests/test_qsketch.py). State is hard-bounded at k rows per group
(driver-held between batches — bounded by contract, like the CMS
grid), so an unbounded stream maintains order statistics in O(G*k)
memory with no state store and no watermark bookkeeping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from external_benchmarks_spark.operators.qsketch import (
    QSKETCH_K,
    hash_sample,
    merge_samples,
    sample_quantiles,
)


class StreamingQuantileSketch:
    """foreachBatch accumulator: `update` folds each micro-batch into
    the bounded state; `state_df` / `quantiles` read it back."""

    def __init__(
        self,
        spark: SparkSession,
        key_cols: list[str],
        k: int = QSKETCH_K,
        group_col: str | None = None,
    ) -> None:
        self.spark = spark
        self.key_cols = list(key_cols)
        self.k = k
        self.group_col = group_col
        self._state_rows: list | None = None
        self._schema = None

    def update(self, batch_df: DataFrame) -> None:
        s = hash_sample(
            batch_df, self.key_cols, k=self.k, group_col=self.group_col
        )
        if self._state_rows is None:
            kept = s
        else:
            prev = self.spark.createDataFrame(self._state_rows, self._schema)
            kept = merge_samples(
                prev, s, self.key_cols, k=self.k, group_col=self.group_col
            )
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

    def quantiles(
        self, value_col: str, ps: tuple[int, ...] = (250, 500, 750, 950)
    ) -> DataFrame:
        return sample_quantiles(
            self.state_df(), value_col, ps=ps, group_col=self.group_col
        )
