"""End-to-end maintenance soak: the WHOLE incremental-curation loop —
dedup → pair sink → absorb → component fold → keep/drop → semantic
dedup → vector absorb → SPAN dedup + absorb (r12) → PQ-index append +
probe (r12) → sorted-export append → centroid refresh →
store/map/span/PQ compaction — driven for N cycles against the same
persisted artifacts, the way a daily 100 TB pipeline actually runs
them.

Round 11 (the r10 verdict's item #5): every maintenance primitive was
built and crash-tested in ISOLATION across rounds 9–10; nothing ever
ran the closed loop long enough to see compounding state — file-count
leaks the compactors miss, per-cycle cost creeping with store size,
or a crash in one primitive corrupting the NEXT primitive's input.
The soak is that evidence: per-cycle wall time and per-artifact file
counts are recorded every cycle (bench leg ``maintenance_soak``), and
the crash test resumes a mid-cycle kill and asserts the final state
equals an uninjured twin run's, artifact by artifact.

RESUMABILITY CONTRACT: ``cycle(i)`` re-run after a crash anywhere
inside it completes without double-applying —

- the syntactic tier goes through ``StreamingDeltaDedup.update`` with
  ``batch_id = i`` — durable exactly-once even across PROCESS
  restarts (persisted ledger + undo marker, r11);
- the vector absorb is gated in-process (``_last_vec_batch``; the
  soak object itself is per-process — its stores rebuild per run);
- the export append is content-digest idempotent
  (``pipeline/export.append_sorted_shards``'s applied ledger);
- refresh / compaction are idempotent journaled maintenance, and every
  reader path force-completes interrupted publishes (recover_refresh /
  recover_append / recover_partition_swaps).

Reference parity note: the reference's pipeline is a one-shot dataset
build (reports over a static snapshot); the soak is the engine-added
operational layer a long-lived deployment of the same semantics needs.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _count_files(*roots: str) -> int:
    """Data files under each root, recursively — the leak detector.
    Markers/ledgers (underscore/dot prefixed) don't count: they are
    bounded by construction."""
    n = 0
    for root in roots:
        if not os.path.isdir(root):
            continue
        for base, _dirs, files in os.walk(root):
            n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


class MaintenanceSoak:
    """Build the persisted artifacts once, then drive cycles.

    Batch i = ``doc_id % (2*n_batches) == i`` / same for ``vec_id``
    against a corpus of ``% (2*n_batches) >= n_batches`` — n_batches
    disjoint daily batches over the benchmark tables (default ten,
    each roughly 5% of the table; the 1.0r ladder soak uses twenty)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        tag: str,
        threshold_fp: int = 200_000,
        rows_per_cell: int = 128,
        n_shards: int = 8,
        n_batches: int = 10,
    ) -> None:
        from external_benchmarks_spark.catalog import Catalog
        from external_benchmarks_spark.operators.compmap import (
            init_component_map,
        )
        from external_benchmarks_spark.operators.deltadedup import (
            build_signature_store,
            build_vector_store,
        )
        from external_benchmarks_spark.pipeline.bucketing import bucket_root
        from external_benchmarks_spark.operators.textprep import (
            build_span_store,
        )
        from external_benchmarks_spark.pipeline.export import (
            rank_sharded,
            write_sorted_shards,
        )
        from external_benchmarks_spark.streaming.deltadedup import (
            StreamingDeltaDedup,
        )

        self.spark = spark
        self.sf_dir = sf_dir
        self.threshold_fp = threshold_fp
        self.rows_per_cell = rows_per_cell
        cat = Catalog(spark, sf_dir)
        self.docs = cat.documents
        self.vecs = cat.embeddings
        self.n_batches = int(n_batches)
        self._mod = 2 * self.n_batches
        corpus_docs = self.docs.filter(F.col("doc_id") % self._mod >= self.n_batches)
        corpus_vecs = self.vecs.filter(F.col("vec_id") % self._mod >= self.n_batches)
        self.sig = build_signature_store(spark, corpus_docs, tag=f"soak_{tag}")
        self.cmap = init_component_map(spark, f"soak_{tag}")
        self.sdd = StreamingDeltaDedup(
            spark, self.sig, component_map=self.cmap
        )
        self.vstore = build_vector_store(
            spark, corpus_vecs, tag=f"soak_{tag}", rows_per_cell=rows_per_cell
        )
        self.layout = os.path.join(bucket_root(f"soak_exp_{tag}"), "sorted")
        base = corpus_docs.select(
            "doc_id", F.length("text").alias("doc_len")
        )
        self.order_cols = ["doc_len", "doc_id"]
        write_sorted_shards(
            rank_sharded(base, [F.col(c) for c in self.order_cols], n_shards),
            [F.col(c) for c in self.order_cols],
            self.layout,
        )
        self.export_target = max(1, base.count() // n_shards)
        self._last_vec_batch = -1
        # r12: the span-count store — the dedup family's last member to
        # get a delta form; absorbed and compacted in the same loop
        self.sstore = build_span_store(spark, corpus_docs, tag=f"soak_{tag}")
        self._last_span_batch = -1
        # r12: the persisted PQ index rides the same loop — frozen-
        # quantizer appends (the batch-id ledger makes re-runs of
        # RECORDED batches idempotent; a crash in the window between a
        # committed append write and the ledger record is the
        # documented layout-append contract — the current-marker is
        # already dropped, so the index reads as not-current and the
        # owner rebuilds rather than replaying into a double-append),
        # a probed read each cycle proves it stays queryable
        # mid-maintenance, layout compaction folds the per-batch
        # append files. r13: built WITH the raw-vector refine sidecar,
        # so appends/compaction exercise it too.
        import math

        from external_benchmarks_spark.pipeline.pqindex import build_pq_index

        n_corpus = corpus_vecs.count()
        self.pqi = build_pq_index(
            spark, corpus_vecs, bucket_root(f"soak_pqi_{tag}"),
            n_centroids=max(16, math.ceil(n_corpus / 1024)),
            store_vectors=True,
        )
        self._pq_qvec = [
            float(x)
            for x in corpus_vecs.select("vec_id", "embedding")
            .orderBy("vec_id")
            .first()["embedding"]
        ]
        # r13 (r12 verdict #7): the SERVING view of the maintained index
        # lives through the whole soak — signature-based refresh() each
        # cycle, with periodic bit-parity asserts against a fresh load,
        # so serving gets the same append/compaction/crash coverage the
        # stores have (a resumed soak rebuilds this object, i.e. serving
        # recovery after a crash IS a fresh load — parity covers it).
        from external_benchmarks_spark.serving import PQServingIndex

        self.pqsrv = PQServingIndex(self.pqi.root)

    def _file_census(self) -> dict:
        return {
            "sig_store": _count_files(self.sig.root),
            "vector_store": _count_files(
                os.path.dirname(self.vstore.vectors_path)
            ),
            "component_map": _count_files(self.cmap.root),
            "export_layout": _count_files(self.layout),
            "span_store": _count_files(self.sstore.root),
            "pq_index": _count_files(self.pqi.codes_path),
            "pq_vectors": _count_files(self.pqi.vectors_path),
        }

    def cycle(self, i: int) -> dict:
        """One daily cycle over batch i. Safe to re-run after a crash
        at ANY point inside (see the module resumability contract)."""
        from external_benchmarks_spark.operators.compmap import (
            compact_component_map,
            keep_flags,
        )
        from external_benchmarks_spark.operators.deltadedup import (
            absorb_delta_vectors,
            compact_signature_store,
            compact_vector_store,
            delta_semdedup,
            refresh_centroids,
        )
        from external_benchmarks_spark.operators.textprep import (
            absorb_delta_spans,
            compact_span_store,
            delta_span_dedup,
        )
        from external_benchmarks_spark.pipeline.export import (
            append_sorted_shards,
        )

        t0 = time.perf_counter()
        # r15 (verdict item #6): per-stage wall split so the cycle-time
        # slope can be ATTRIBUTED (data growth vs file counts vs host)
        # instead of eyeballed from the 20-cycle total alone.
        stages: dict = {}
        _last = [t0]

        def stamp(name: str) -> None:
            now = time.perf_counter()
            stages[name] = round(
                stages.get(name, 0.0) + (now - _last[0]), 3
            )
            _last[0] = now

        batch_docs = self.docs.filter(F.col("doc_id") % self._mod == i)
        batch_vecs = self.vecs.filter(F.col("vec_id") % self._mod == i)
        # syntactic tier: dedup -> pair sink -> absorb -> fold (gated)
        self.sdd.update(batch_docs, batch_id=i)
        stamp("syntactic")
        # semantic tier: cell-blocked pairs, then gated absorb
        sem_pairs = delta_semdedup(
            self.spark, batch_vecs, self.vstore,
            threshold_fp=self.threshold_fp,
        ).count()
        stamp("semantic_pairs")
        if i > self._last_vec_batch:
            absorb_delta_vectors(self.spark, batch_vecs, self.vstore)
            self._last_vec_batch = i
        stamp("vector_absorb")
        # span tier (r12): cross-doc span removal for the batch against
        # corpus ∪ everything absorbed, then gated absorb — the same
        # in-process gate as the vector tier (the soak object is
        # per-process; the store rebuilds per run)
        span_dropped = (
            delta_span_dedup(self.spark, batch_docs, self.sstore)
            .agg(F.sum("n_dropped")).collect()[0][0]
        )
        stamp("span_dedup")
        if i > self._last_span_batch:
            absorb_delta_spans(self.spark, batch_docs, self.sstore)
            self._last_span_batch = i
        stamp("span_absorb")
        # PQ-index tier (r12): frozen-quantizer append (ledger-gated —
        # a crashed cycle's re-run skips it), then a probed read proves
        # the index answers mid-maintenance
        from external_benchmarks_spark.pipeline.pqindex import (
            append_pq_index,
            pq_index_topk,
        )

        append_pq_index(self.spark, self.pqi, batch_vecs, batch_id=f"b{i}")
        pq_hits = pq_index_topk(
            self.spark, self.pqi, self._pq_qvec, k=20, nprobe=4
        ).count()
        stamp("pq_append_probe")
        # keep/drop over everything ingested so far, feeding the export
        seen = self.docs.filter(
            (F.col("doc_id") % self._mod >= self.n_batches)
            | (F.col("doc_id") % self._mod <= i)
        )
        flagged = keep_flags(
            self.spark, self.cmap, seen, key_col="doc_id"
        ).localCheckpoint(eager=True)  # one resolve feeds both consumers
        kept = flagged.filter(F.col("keep")).count()
        stamp("keep_flags")
        # export append: the batch's KEPT rows merge into the sorted
        # layout (digest-idempotent on re-run); `seen` contains the
        # batch, so derive it by filter instead of a second resolve
        kept_batch = (
            flagged.filter((F.col("doc_id") % 20 == i) & F.col("keep"))
            .select("doc_id", F.length("text").alias("doc_len"))
        )
        app = append_sorted_shards(
            self.spark,
            self.layout,
            kept_batch,
            self.order_cols,
            target_rows=self.export_target,
        )
        stamp("export_append")
        # periodic maintenance: refresh geometry + fold the relabel
        # chain every third cycle; compact the signature store whenever
        # absorbs fragmented it past the threshold
        refreshed = None
        if i % 3 == 2:
            refreshed = refresh_centroids(
                self.spark, self.vstore, rows_per_cell=self.rows_per_cell
            )
        stamp("centroid_refresh")
        # compactions run EVERY cycle and self-gate on their thresholds
        # (a no-op census when under), so fragmentation is bounded by
        # threshold x one absorb instead of threshold x cycles-between
        # relabel_fold_ratio (r15): the per-stage split found the
        # every-cycle relabel fold was the dominant slope owner — a few
        # deposed reps triggered a full O(corpus) base rewrite per
        # cycle; readers resolve the relabel live, so the fold defers
        # until 1% of the base would change (fragmentation still folds)
        compact_component_map(
            self.spark, self.cmap, max_files_per_bucket=4,
            relabel_fold_ratio=0.01,
        )
        stamp("compact_cmap")
        comp = compact_signature_store(
            self.spark, self.sig, max_files_per_bucket=4
        )
        stamp("compact_sig")
        scomp = compact_span_store(
            self.spark, self.sstore, max_files_per_bucket=4
        )
        stamp("compact_span")
        # r15: the semantic vector store joins the per-cycle compaction
        # set — it was the ONE persisted artifact with no compactor
        # (r14 census: 159 -> 444 files over 20 cycles, +14/cycle
        # unbounded; absorb appends a file set per batch and
        # refresh_centroids rewrites only dirty cells). Threshold 2,
        # not the siblings' 4: an absorb adds ~1 file per cell per ~10
        # cycles here (the delta's part files spread across ~10x more
        # cells than the bucketed stores have buckets), so threshold 4
        # takes ~30 cycles to first fire and a 20-cycle census window
        # cannot witness the bound — at 2 the fold runs in-window and
        # the equilibrium census sits at ~cells x 2.
        vcomp = compact_vector_store(
            self.spark, self.vstore, max_files_per_cell=2
        )
        stamp("compact_vec")
        from external_benchmarks_spark.pipeline.index import (
            compact_layout_partitions,
        )

        pq_comp = compact_layout_partitions(
            self.spark, self.pqi.codes_path, max_files_per_partition=4
        )
        pqv_comp = compact_layout_partitions(
            self.spark, self.pqi.vectors_path, max_files_per_partition=4
        )
        stamp("compact_pq")
        # serving-tier refresh (r13): pick up this cycle's append AND
        # any compaction swaps, O(dirty cells); every third cycle,
        # assert the long-lived serving view answers bit-identically —
        # ADC and rerank tiers both — to a FRESH load of the same files
        sr0 = time.perf_counter()
        srv_refreshed = self.pqsrv.refresh()
        srv_refresh_s = round(time.perf_counter() - sr0, 3)
        srv_parity = None
        if i % 3 == 2:
            from external_benchmarks_spark.serving import PQServingIndex

            fresh = PQServingIndex(self.pqi.root)
            srv_parity = bool(
                self.pqsrv.topk(self._pq_qvec, k=50, nprobe=None)
                == fresh.topk(self._pq_qvec, k=50, nprobe=None)
                and self.pqsrv.topk_rerank(
                    self._pq_qvec, k=20, rerank=100, nprobe=None
                )
                == fresh.topk_rerank(
                    self._pq_qvec, k=20, rerank=100, nprobe=None
                )
            )
        out = {
            "cycle": i,
            "seconds": round(time.perf_counter() - t0, 3),
            "sem_pairs": int(sem_pairs),
            "kept": int(kept),
            "export_touched": len(app.get("touched", [])),
            "bands_compacted": len(comp["bands_partitions"]),
            "span_dropped": int(span_dropped or 0),
            "spans_compacted": len(scomp["spans_partitions"]),
            "vector_cells_compacted": len(vcomp),
            "pq_hits": int(pq_hits),
            "pq_cells_compacted": len(pq_comp),
            "pq_vector_cells_compacted": len(pqv_comp),
            "serving_refreshed_cells": len(srv_refreshed),
            "serving_refresh_s": srv_refresh_s,
            "serving_parity": srv_parity,
            "refresh_moved": None if refreshed is None else refreshed["moved"],
            "stages": stages,
            "files": self._file_census(),
        }
        return out

    def final_state(self) -> dict:
        """Logical contents of every artifact, for uninjured-twin
        comparison: sorted row tuples (cheap at benchmark scale)."""
        from external_benchmarks_spark.operators.compmap import (
            resolve_components,
        )
        from external_benchmarks_spark.pipeline.export import (
            sorted_layout_rows,
        )

        comps = sorted(
            tuple(r)
            for r in resolve_components(self.spark, self.cmap).collect()
        )
        vrows = sorted(
            (r["vec_id"], int(r["cell"]))
            for r in self.spark.read.parquet(self.vstore.vectors_path)
            .select("vec_id", "cell")
            .collect()
        )
        lrows = sorted(
            tuple(r)
            for r in sorted_layout_rows(
                self.spark, self.layout, self.order_cols
            )
            .select("doc_id", "doc_len", "global_rank")
            .collect()
        )
        pairs = sorted(
            tuple(r)
            for r in self.sdd.pairs_df().drop("batch_id").collect()
        )
        spans = sorted(
            tuple(r)
            for r in self.spark.table(self.sstore.spans_table)
            .groupBy("span")
            .agg(F.sum("n_docs").alias("n_docs"))
            .collect()
        )
        pq_codes = sorted(
            (r["vec_id"], int(r["centroid_id"]), tuple(r["pq_codes"]))
            for r in self.spark.read.parquet(self.pqi.codes_path)
            .select("vec_id", "centroid_id", "pq_codes")
            .collect()
        )
        pq_vectors = sorted(
            (r["vec_id"], int(r["centroid_id"]))
            for r in self.spark.read.parquet(self.pqi.vectors_path)
            .select("vec_id", "centroid_id")
            .collect()
        )
        return {
            "components": comps,
            "vectors": vrows,
            "layout": lrows,
            "pairs": pairs,
            "spans": spans,
            "pq_codes": pq_codes,
            "pq_vectors": pq_vectors,
        }

    def cleanup(self) -> None:
        import shutil

        for t in (
            self.sig.bands_table,
            self.sig.shingles_table,
            self.cmap.table,
            self.sstore.spans_table,
        ):
            self.spark.sql(f"DROP TABLE IF EXISTS {t}")
        for p in (
            self.sig.root,
            os.path.dirname(self.vstore.vectors_path),
            self.cmap.root,
            os.path.dirname(self.layout),
            self.sstore.root,
            self.pqi.root,
        ):
            shutil.rmtree(p, ignore_errors=True)


def run_soak(
    spark: SparkSession, sf_dir: str, tag: str, n_cycles: int = 10
) -> dict:
    """Build, drive ``n_cycles`` cycles, clean up; returns per-cycle
    stats + build time — the bench leg's payload."""
    t0 = time.perf_counter()
    soak = MaintenanceSoak(
        spark, sf_dir, tag, n_batches=max(10, n_cycles)
    )
    build_s = round(time.perf_counter() - t0, 3)
    try:
        cycles = [soak.cycle(i) for i in range(n_cycles)]
    finally:
        soak.cleanup()
    secs = [c["seconds"] for c in cycles]
    refresh_s = sorted(c["serving_refresh_s"] for c in cycles)
    parities = [
        c["serving_parity"] for c in cycles if c["serving_parity"] is not None
    ]
    return {
        "build_s": build_s,
        "cycles": cycles,
        "cycle_s_min": min(secs),
        "cycle_s_median": sorted(secs)[len(secs) // 2],
        "cycle_s_max": max(secs),
        "serving_refresh_s_median": refresh_s[len(refresh_s) // 2],
        "serving_parity_checks": len(parities),
        "serving_parity_ok": all(parities) if parities else None,
        "files_first": cycles[0]["files"],
        "files_last": cycles[-1]["files"],
    }
