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

Exactly-once across PROCESS restarts (round 11 — the r10 round's gate
was in-memory only, so a mid-update crash double-applied the pair sink
and the store absorb on replay): stores with a ``root`` get a durable
protocol —

- a persisted LEDGER (``_absorbed_batches.json``) of completed batch
  ids; replayed ids skip even in a fresh process;
- an UNDO MARKER (``_inflight_batch.json``) written before any batch
  mutation, recording the store's pre-absorb file listing and the
  batch's pair-sink dir. Each mutating step is job-atomic (Spark's
  commit protocol publishes files only on job commit), so a crash
  leaves the store = pre-listing ∪ some committed appends;
  :meth:`recover` (run at init and before every update) deletes the
  files absent from the listing and the batch's pair dir, restoring
  the exact pre-batch state — the re-run then applies exactly once.
  The component-map fold needs no undo: ``fold_pairs`` is idempotent
  and convergent under partial replay (tested).

Stores without a root keep the in-memory gate (the plain at-least-once
foreachBatch contract); the pair sink's batch_id column still makes
replayed duplicates distinguishable either way."""

from __future__ import annotations

import json
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
        self._ledger = (
            os.path.join(store.root, "_absorbed_batches.json")
            if store.root
            else None
        )
        self._marker = (
            os.path.join(store.root, "_inflight_batch.json")
            if store.root
            else None
        )
        if self._ledger:
            self.recover()
            done = self._read_ledger()
            if done:
                self._last_batch = max(done)

    def _read_ledger(self) -> list[int]:
        try:
            with open(self._ledger) as fh:
                return json.load(fh)
        except (OSError, ValueError, TypeError):
            return []

    def _record_done(self, batch_id: int, keep: int = 1024) -> None:
        ids = self._read_ledger()
        if batch_id not in ids:
            ids.append(int(batch_id))
        tmp = self._ledger + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ids[-keep:], fh)
        os.replace(tmp, self._ledger)

    def _store_listing(self) -> dict:
        """Relative paths of every data file in the two store dirs —
        O(store file count), bounded by compaction, never row-sized."""
        out: dict = {}
        for sub in ("bands", "shingles"):
            root = os.path.join(self.store.root, sub)
            files = []
            if os.path.isdir(root):
                for base, _dirs, fs in os.walk(root):
                    rel = os.path.relpath(base, root)
                    files.extend(
                        os.path.join(rel, f)
                        for f in fs
                        if not f.startswith(("_", "."))
                    )
            out[sub] = sorted(files)
        return out

    def recover(self) -> bool:
        """Undo a batch whose update crashed mid-apply: every data file
        not in the marker's pre-absorb listing deletes (each mutating
        step is job-atomic, so the store is exactly pre-state ∪ whole
        committed appends), the batch's pair-sink dir drops, and the
        marker clears — the re-run then applies the batch exactly
        once. Idempotent; no-op without a marker."""
        import shutil

        if not self._marker or not os.path.exists(self._marker):
            return False
        with open(self._marker) as fh:
            j = json.load(fh)
        # A batch already in the ledger COMMITTED — the crash hit between
        # _record_done and the marker removal. Undoing it here would
        # delete its committed files while the ledger makes every replay
        # skip: permanent row loss. The marker is stale; just drop it.
        if int(j.get("batch_id", -1)) in self._read_ledger():
            os.remove(self._marker)
            return True
        for sub in ("bands", "shingles"):
            root = os.path.join(self.store.root, sub)
            keep = set(j["files"].get(sub, []))
            if not os.path.isdir(root):
                continue
            for base, _dirs, fs in os.walk(root):
                rel = os.path.relpath(base, root)
                for f in fs:
                    if f.startswith(("_", ".")):
                        continue
                    if os.path.join(rel, f) not in keep:
                        os.remove(os.path.join(base, f))
        shutil.rmtree(j["pairs_dir"], ignore_errors=True)
        os.remove(self._marker)
        for t in (self.store.bands_table, self.store.shingles_table):
            self.spark.catalog.refreshTable(t)
        return True

    def update(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        if self._marker:
            self.recover()  # cheap exists-check when nothing crashed
        if batch_id <= self._last_batch or (
            self._ledger and batch_id in self._read_ledger()
        ):
            return  # replayed batch: already absorbed
        if self._marker:
            tmp = self._marker + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "batch_id": int(batch_id),
                        "files": self._store_listing(),
                        "pairs_dir": os.path.join(
                            self.pairs_path, f"batch_id={int(batch_id)}"
                        ),
                    },
                    fh,
                )
            os.replace(tmp, self._marker)
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
        if self._ledger:
            self._record_done(batch_id)
            os.remove(self._marker)
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
