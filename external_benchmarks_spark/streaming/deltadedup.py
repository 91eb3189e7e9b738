"""LIVE incremental dedup — the streaming face of
operators/deltadedup.py: each micro-batch near-dup-joins the persisted
corpus store (new-vs-corpus AND new-vs-new within the batch), emits its
pairs, then ABSORBS into the store so the next batch joins
corpus ∪ everything-seen. The maintained-state pattern of
streaming/kmv.py / qsketch.py / retention.py, except the state is the
persisted store itself — disk-resident, bucketed, shared with the
batch path — so the stream holds NO driver state at all and a restart
resumes from whatever the store already absorbed.

Exactly-once caveat (stated, not hidden): absorb is an append, so a
REPLAYED micro-batch would re-append its rows. foreachBatch callers
that need exactly-once should gate on batch_id (the helper does —
batches at or below the last absorbed id are skipped; the id lives in
memory, so a full restart re-processes the in-flight batch, the
standard at-least-once foreachBatch contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from external_benchmarks_spark.operators.deltadedup import (
    SignatureStore,
    absorb_delta,
    delta_dedup,
)


class StreamingDeltaDedup:
    """foreachBatch loop: dedup each micro-batch against the store,
    collect the (bounded: pairs touching one batch) results, absorb."""

    def __init__(
        self,
        spark: SparkSession,
        store: SignatureStore,
        key_col: str = "doc_id",
        content_col: str = "text",
        threshold_ppm: int = 600_000,
    ) -> None:
        self.spark = spark
        self.store = store
        self.key_col = key_col
        self.content_col = content_col
        self.threshold_ppm = threshold_ppm
        self.pairs: list = []
        self._last_batch = -1

    def update(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        if batch_id <= self._last_batch:
            return  # replayed batch: already absorbed
        # foreachBatch hands a frame bound to a CLONED SparkSession; the
        # previous batch's insertInto refreshed the file index through
        # THAT clone, and a later clone can still hold a stale listing —
        # refresh both store tables explicitly before reading them
        # (without this, cross-batch pairs silently vanish; covered by
        # tests/test_deltadedup.py::test_streaming_dedup_matches_...)
        for t in (self.store.bands_table, self.store.shingles_table):
            self.spark.catalog.refreshTable(t)
        res = delta_dedup(
            self.spark,
            batch_df,
            self.store,
            key_col=self.key_col,
            content_col=self.content_col,
            threshold_ppm=self.threshold_ppm,
        )
        self.pairs.extend(tuple(r) for r in res.collect())
        absorb_delta(
            self.spark, batch_df, self.store, self.key_col, self.content_col
        )
        self._last_batch = batch_id

    def foreach_batch(self):
        return lambda batch_df, batch_id: self.update(batch_df, batch_id)
