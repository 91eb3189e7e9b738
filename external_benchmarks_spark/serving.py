"""Low-latency serving tier over the Spark-built index layout.

The reference's read SLA (100 ms p95 @ 20 QPS, reference README.md:62-70)
describes SERVING reads, and Spark's ~0.2-0.3 s per-job floor (scheduler +
Py4J round-trip) can never meet it no matter how good the plan is —
BASELINE.md documents that floor. The architecture answer is the standard
lakehouse split: Spark BUILDS the query-optimized layout (partitioned,
sorted, pruned — `pipeline/index.build_index_layout`), and a serving
process memory-maps that SAME parquet layout and answers point reads
without a cluster job. This module is that serving tier: pyarrow reads
the label-partitioned directories once, keeps per-label (ids, matrix)
arrays, and answers filtered top-k in one BLAS call.

Parity contract: scores are computed exactly like the Spark fast path
(`functions/vector.score_batch_udf`) — float64 matmul over the float32
embeddings, ties broken by ascending key — so serving results are
bit-identical to the Spark query's (asserted in tests/test_serving.py).

Scale shape: one serving node holds the HOT partitions (a label's matrix
at dim=64 x 1M rows is ~512 MB float64, or half that served as float32);
a fleet shards by partition key exactly like the directory layout. Cold
partitions fall back to the Spark path, which keeps directory pruning.
"""

from __future__ import annotations

import os

import numpy as np


class VectorServingIndex:
    """In-memory filtered top-k over a ``partitionBy(label)`` parquet
    layout (the output of ``pipeline/index.build_index_layout`` or the
    bench's vtopk layout)."""

    def __init__(
        self,
        layout_dir: str,
        key_col: str = "vec_id",
        emb_col: str = "embedding",
        partition_col: str = "label",
    ):
        import pyarrow.parquet as pq

        self.key_col = key_col
        self.emb_col = emb_col
        self.partition_col = partition_col
        self.partitions: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        prefix = f"{partition_col}="
        for entry in sorted(os.listdir(layout_dir)):
            if not entry.startswith(prefix):
                continue
            label = int(entry.split("=", 1)[1])
            tbl = pq.read_table(
                os.path.join(layout_dir, entry), columns=[key_col, emb_col]
            )
            ids = tbl.column(key_col).to_numpy()
            emb = tbl.column(emb_col).combine_chunks()
            values = emb.values.to_numpy(zero_copy_only=False)
            n = len(tbl)
            dim = len(values) // max(n, 1)
            # float64 scoring matrix — same dtype promotion as the Spark
            # fast path (score_batch_udf does astype(float64) per batch)
            mat = values.reshape(n, dim).astype(np.float64)
            self.partitions[label] = (np.asarray(ids), mat)
        if not self.partitions:
            raise ValueError(f"no {prefix}* directories under {layout_dir}")

    def topk(
        self,
        qvec,
        k: int = 100,
        label: int | None = None,
        key_mod: int | None = None,
    ) -> list[tuple[int, float]]:
        """Filtered dot-product top-k: ``label == L`` prunes to one
        in-memory partition (the serving analog of directory pruning);
        ``key_mod = m`` adds the bench templates' ``key % m == 0``
        refinement. Returns [(key, score)] ordered by (-score, key) —
        the Spark query's exact output order."""
        q = np.asarray(qvec, dtype=np.float64)
        if label is not None:
            parts = [self.partitions[label]] if label in self.partitions else []
        else:
            parts = list(self.partitions.values())
        best_ids: list[np.ndarray] = []
        best_scores: list[np.ndarray] = []
        for ids, mat in parts:
            if key_mod is not None:
                mask = ids % key_mod == 0
                ids, mat = ids[mask], mat[mask]
            if len(ids) == 0:
                continue
            scores = mat @ q
            if len(ids) > k:
                # partial-select the partition's own top-k before the merge
                # (per-partition heap, exactly TakeOrderedAndProject's shape).
                # Ties at the k-th score are resolved by id — the full
                # (-score, id) order — so the pruned set is exactly what the
                # Spark query would keep (bit-identical parity contract).
                idx = np.argpartition(-scores, k - 1)[:k]
                thresh = scores[idx].min()
                above = np.nonzero(scores > thresh)[0]
                at = np.nonzero(scores == thresh)[0]
                at = at[np.argsort(ids[at])[: k - len(above)]]
                sel = np.concatenate([above, at])
                ids, scores = ids[sel], scores[sel]
            best_ids.append(ids)
            best_scores.append(scores)
        if not best_ids:
            return []
        ids = np.concatenate(best_ids)
        scores = np.concatenate(best_scores)
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]
