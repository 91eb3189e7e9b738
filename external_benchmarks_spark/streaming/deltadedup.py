"""LIVE incremental dedup — the streaming face of
operators/deltadedup.py: each micro-batch near-dup-joins the persisted
corpus store (new-vs-corpus AND new-vs-new within the batch), emits its
pairs, then ABSORBS into the store so the next batch joins
corpus ∪ everything-seen. The maintained-state pattern of
streaming/kmv.py / qsketch.py / retention.py, except the state is the
persisted store itself — disk-resident, bucketed, shared with the
batch path — so the stream holds NO driver state at all and a restart
resumes from whatever the store already absorbed. Pairs land in a
parquet PAIR SINK (append per micro-batch, a ``batch_id`` column keyed
to the stream's epoch) — on a dup-heavy 100 TB stream the pair set is
unbounded, so it must live on disk with the rest of the state, never
in a driver list; downstream keep/drop consumers read the sink (or
fold it into a ComponentMap — operators/compmap.py).

Exactly-once caveat (stated, not hidden): absorb is an append, so a
REPLAYED micro-batch would re-append its rows. foreachBatch callers
that need exactly-once should gate on batch_id (the helper does —
batches at or below the last absorbed id are skipped; the id lives in
memory, so a full restart re-processes the in-flight batch, the
standard at-least-once foreachBatch contract). The pair sink carries
batch_id for the same reason: a replayed batch's duplicate pairs are
distinguishable and drop with ``dropDuplicates`` on read if a caller
replays without the gate."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.deltadedup import (
    SignatureStore,
    absorb_delta,
    delta_dedup,
)


class StreamingDeltaDedup:
    """foreachBatch loop: dedup each micro-batch against the store,
    append the batch's pairs to the parquet pair sink, absorb. The
    update path runs NO collect — batch pairs flow executor-side from
    the dedup join straight into the sink write."""

    def __init__(
        self,
        spark: SparkSession,
        store: SignatureStore,
        key_col: str = "doc_id",
        content_col: str = "text",
        threshold_ppm: int = 600_000,
        pairs_path: str | None = None,
        component_map=None,
    ) -> None:
        self.spark = spark
        self.store = store
        self.key_col = key_col
        self.content_col = content_col
        self.threshold_ppm = threshold_ppm
        self.pairs_path = pairs_path or os.path.join(store.root, "pairs")
        # optional operators/compmap.ComponentMap: when set, each
        # batch's pairs also FOLD into the persisted component map, so
        # the live loop closes as dedup -> absorb -> component-update
        # -> keep/drop (resolve_components/keep_flags read the result)
        self.component_map = component_map
        self._pairs_schema = None
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
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
        self._pairs_schema = res.schema  # statically known, no action
        # One file per batch under its own batch_id=N partition dir, so
        # per-batch consumers (the component-map fold below) read ONE
        # directory instead of listing the whole lifetime sink; the
        # coalesce keeps it a single file.
        res.coalesce(1).write.mode("append").partitionBy("batch_id").parquet(
            self.pairs_path
        )
        absorb_delta(
            self.spark, batch_df, self.store, self.key_col, self.content_col
        )
        if self.component_map is not None:
            from external_benchmarks_spark.operators.compmap import fold_pairs

            # fold THIS batch's pairs, read back from its own partition
            # dir (O(1) files regardless of stream lifetime — never
            # recompute the dedup join); an empty batch writes no dir,
            # and fold is idempotent so replays are harmless too
            batch_dir = os.path.join(
                self.pairs_path, f"batch_id={int(batch_id)}"
            )
            if os.path.isdir(batch_dir):
                fold_pairs(
                    self.spark,
                    self.component_map,
                    self.spark.read.parquet(batch_dir),
                )
        self._last_batch = batch_id

    def pairs_df(self) -> DataFrame:
        """All pairs emitted so far, read back from the sink:
        (id_a, id_b, inter, un, jaccard, batch_id). batch_id comes back
        as a partition-directory key; cast to bigint so the schema
        matches the written column (and the empty-sink fallback)."""
        try:
            return self.spark.read.parquet(self.pairs_path).withColumn(
                "batch_id", F.col("batch_id").cast("bigint")
            )
        except Exception:
            if self._pairs_schema is not None:
                return self.spark.createDataFrame([], self._pairs_schema)
            raise

    def foreach_batch(self):
        return lambda batch_df, batch_id: self.update(batch_df, batch_id)
