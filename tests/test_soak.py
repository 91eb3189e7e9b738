"""End-to-end maintenance soak (pipeline/soak.py — r10 verdict item
#5): the closed loop dedup → absorb → fold → keep/drop → semantic
dedup → vector absorb → export append → centroid refresh → compaction,
driven for N cycles with crashes injected mid-cycle. The injured run
must RESUME (re-run the same cycle) and end logically identical to an
uninjured twin, and no artifact may fragment past its compaction
bound."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from external_benchmarks_spark.pipeline.soak import MaintenanceSoak

SF = "/root/testdata/sf0.001"
N_CYCLES = 6


def test_soak_crash_resume_equals_uninjured_twin(spark):
    import external_benchmarks_spark.operators.deltadedup as dd
    import external_benchmarks_spark.pipeline.layout as layout_mod

    # uninjured twin
    twin = MaintenanceSoak(spark, SF, "soak_twin")
    try:
        for i in range(N_CYCLES):
            twin.cycle(i)
        want = twin.final_state()
    finally:
        twin.cleanup()

    soak = MaintenanceSoak(spark, SF, "soak_injured")
    try:
        cycles = []
        for i in range(N_CYCLES):
            if i == 2:
                # crash the centroid refresh between the dirty-cell
                # swaps and the centroid publish (the r10 advice window)
                real = dd.swap_dir

                def boom(path, staged):
                    raise RuntimeError("injected refresh crash")

                dd.swap_dir = boom
                try:
                    with pytest.raises(RuntimeError, match="injected"):
                        soak.cycle(i)
                finally:
                    dd.swap_dir = real
            if i == 4:
                # crash the export append inside its swap loop (after
                # the journal commit point, before any/most shards land)
                orig = layout_mod.swap_partition_dir

                def crashy(root, name, staged):
                    if name.startswith("shard="):
                        raise RuntimeError("injected append crash")
                    return orig(root, name, staged)

                layout_mod.swap_partition_dir = crashy
                try:
                    with pytest.raises(RuntimeError, match="injected"):
                        soak.cycle(i)
                finally:
                    layout_mod.swap_partition_dir = orig
            # resume: the SAME cycle re-runs to completion (gated /
            # digest-idempotent / journaled paths make this safe)
            cycles.append(soak.cycle(i))
        got = soak.final_state()

        assert got["components"] == want["components"]
        assert got["vectors"] == want["vectors"]
        assert got["layout"] == want["layout"]
        assert got["pairs"] == want["pairs"]
        assert got["spans"] == want["spans"]
        assert got["pq_codes"] == want["pq_codes"]
        assert got["pq_vectors"] == want["pq_vectors"]
        assert len(got["pq_codes"]) > 0
        assert len(got["pq_vectors"]) > 0
        assert len(got["layout"]) > 0 and len(got["vectors"]) > 0

        # the long-lived SERVING view of the PQ index (refreshed every
        # cycle, including the crash-resumed ones) answered
        # bit-identically to a fresh load at every parity checkpoint —
        # ADC and rerank tiers both (r12 verdict #7)
        parities = [
            c["serving_parity"]
            for c in cycles
            if c["serving_parity"] is not None
        ]
        assert parities and all(parities), parities

        # no artifact fragments past its compaction bound
        from external_benchmarks_spark.pipeline.bucketing import (
            max_bucket_files,
        )

        assert max_bucket_files(os.path.join(soak.sig.root, "bands")) <= 4 + 1
        assert max_bucket_files(os.path.join(soak.cmap.root, "base")) <= 4 + 1
        # r15: the semantic vector store compacts too (r14 verdict #2 —
        # it was the one artifact with no compactor: +14 files/cycle,
        # unbounded); every cell dir holds at most the threshold. The
        # vstore's part files are not bucket-named, so count directly
        # rather than via max_bucket_files (whose bucket-id regex would
        # treat every plain part file as its own bucket and pass
        # vacuously).
        for d in os.listdir(soak.vstore.vectors_path):
            if d.startswith("cell="):
                files = [
                    f
                    for f in os.listdir(
                        os.path.join(soak.vstore.vectors_path, d)
                    )
                    if not f.startswith(("_", "."))
                ]
                assert len(files) <= 2, (d, files)
        # every shard dir in the export layout keeps one sorted file
        for d in os.listdir(soak.layout):
            if d.startswith("shard="):
                files = [
                    f
                    for f in os.listdir(os.path.join(soak.layout, d))
                    if not f.startswith(("_", "."))
                ]
                assert len(files) == 1, (d, files)
        # per-cycle keep/drop counts grow monotonically with ingestion
        kepts = [c["kept"] for c in cycles]
        assert kepts == sorted(kepts)
    finally:
        soak.cleanup()
