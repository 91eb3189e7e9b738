"""Incremental connected components over the persisted component map
(operators/compmap.py): fold-vs-from-scratch equality, idempotence,
relabel compression, compaction, plan shape, and the closed live dedup
loop (seed from the signature store + per-batch folds == components
over the full pair set)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.operators.compmap import (
    compact_component_map,
    fold_pairs,
    init_component_map,
    keep_flags,
    resolve_components,
)
from external_benchmarks_spark.operators.deltadedup import (
    build_signature_store,
    delta_dedup,
    store_self_pairs,
)
from external_benchmarks_spark.operators.graph import connected_components_auto


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def _resolved(spark, cmap):
    return sorted(
        (r.doc_id, r.rep, r.keep)
        for r in resolve_components(spark, cmap).collect()
    )


def _scratch(spark, all_pairs):
    comps = connected_components_auto(_pairs_df(spark, all_pairs))
    return sorted(
        (r.node, r.component, r.node == r.component) for r in comps.collect()
    )


def test_fold_batches_equal_from_scratch_components(spark):
    """Sequential folds over adversarial batches — merges of existing
    components, a late-arriving smaller id deposing a rep, and a
    three-way chain forcing relabel compression — must equal
    from-scratch CC over the union of all pairs, after EVERY batch."""
    batches = [
        # batch 0: two separate components {10,20}, {30,40}
        [(10, 20), (30, 40)],
        # batch 1: merge them through a new node (50): {10,20,30,40,50}
        [(20, 50), (50, 30)],
        # batch 2: brand-new component {100, 110}
        [(100, 110)],
        # batch 3: a SMALLER id (5) joins — rep 10 is deposed by 5,
        # exercising relabel-through-the-chain (20->10 resolved -> 5)
        [(5, 20)],
        # batch 4: merge {100,110} into the big one: rep 100 -> 5 and
        # the prior relabel rows must compress to point at 5 directly
        [(110, 40)],
    ]
    cmap = init_component_map(spark, "t_fold_eq")
    seen: list = []
    for b in batches:
        fold_pairs(spark, cmap, _pairs_df(spark, b))
        seen.extend(b)
        assert _resolved(spark, cmap) == _scratch(spark, seen)
    # relabel stays transitively COMPRESSED: resolution is one hop, so
    # every new_rep must itself be a live rep (never a deposed one)
    from external_benchmarks_spark.operators.compmap import _read_relabel

    rl = _read_relabel(spark, cmap)
    deposed = {r.old_rep for r in rl.collect()}
    targets = {r.new_rep for r in rl.collect()}
    assert not (targets & deposed)


def test_fold_is_idempotent(spark):
    cmap = init_component_map(spark, "t_fold_idem")
    b = [(1, 2), (2, 3), (7, 8)]
    fold_pairs(spark, cmap, _pairs_df(spark, b))
    before = _resolved(spark, cmap)
    base_files = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(cmap.root, "base"))
        for f in fs
        if not f.startswith(("_", "."))
    }
    fold_pairs(spark, cmap, _pairs_df(spark, b))  # replay
    after_files = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(cmap.root, "base"))
        for f in fs
        if not f.startswith(("_", "."))
    }
    assert _resolved(spark, cmap) == before
    assert after_files == base_files  # zero base rows appended


def test_compact_folds_relabel_into_base(spark):
    from external_benchmarks_spark.operators.compmap import _read_relabel

    cmap = init_component_map(spark, "t_compact")
    fold_pairs(spark, cmap, _pairs_df(spark, [(10, 20), (30, 40)]))
    fold_pairs(spark, cmap, _pairs_df(spark, [(20, 30)]))  # deposes 30
    assert _read_relabel(spark, cmap).count() > 0
    before = _resolved(spark, cmap)
    assert compact_component_map(spark, cmap) > 0
    assert _read_relabel(spark, cmap).count() == 0
    assert _resolved(spark, cmap) == before
    # and folding continues to work against the compacted base
    fold_pairs(spark, cmap, _pairs_df(spark, [(40, 50)]))
    assert _resolved(spark, cmap) == _scratch(
        spark, [(10, 20), (30, 40), (20, 30), (40, 50)]
    )


def test_compact_relabel_fold_ratio_defers(spark):
    """With relabel_fold_ratio set, a small relabel table DEFERS the
    full base rewrite (readers resolve the chain live, so nothing is
    owed); answers are identical deferred vs folded, and a ratio the
    table exceeds folds as before (r15 — the every-cycle fold was the
    1.0r soak's dominant cycle-time slope owner)."""
    from external_benchmarks_spark.operators.compmap import _read_relabel

    cmap = init_component_map(spark, "t_defer")
    fold_pairs(
        spark, cmap, _pairs_df(spark, [(i, i + 1000) for i in range(100)])
    )
    fold_pairs(spark, cmap, _pairs_df(spark, [(5, 1006)]))  # deposes one
    n_rel = _read_relabel(spark, cmap).count()
    assert n_rel > 0
    want = _resolved(spark, cmap)
    # 1 relabel row over a 200-row base = 0.5% < 5% -> deferred
    assert compact_component_map(
        spark, cmap, relabel_fold_ratio=0.05
    ) == 0
    assert _read_relabel(spark, cmap).count() == n_rel  # untouched
    assert _resolved(spark, cmap) == want  # live resolution unchanged
    # a ratio the table exceeds folds and clears, same answers
    assert compact_component_map(
        spark, cmap, relabel_fold_ratio=0.001
    ) > 0
    assert _read_relabel(spark, cmap).count() == 0
    assert _resolved(spark, cmap) == want


def test_recovery_restores_base_and_relabel_mid_swap(spark):
    """compact_component_map (or a relabel publish) crashed between its
    two renames: live dir gone, sibling .trash holds the data. Any
    subsequent fold/resolve must restore it and answer correctly."""
    cmap = init_component_map(spark, "t_crash_rec")
    fold_pairs(spark, cmap, _pairs_df(spark, [(10, 20), (30, 40)]))
    fold_pairs(spark, cmap, _pairs_df(spark, [(20, 30)]))
    want = _resolved(spark, cmap)
    base = os.path.join(cmap.root, "base")
    os.rename(base, base + ".trash")
    os.rename(cmap.relabel_path, cmap.relabel_path + ".trash")
    assert _resolved(spark, cmap) == want  # resolve recovers both
    assert os.path.isdir(base) and os.path.isdir(cmap.relabel_path)
    # and folding proceeds against the recovered state
    fold_pairs(spark, cmap, _pairs_df(spark, [(40, 50)]))
    assert _resolved(spark, cmap) == _scratch(
        spark, [(10, 20), (30, 40), (20, 30), (40, 50)]
    )


def test_keep_flags_on_doc_table(spark):
    cmap = init_component_map(spark, "t_keepf")
    fold_pairs(spark, cmap, _pairs_df(spark, [(1, 2), (2, 3)]))
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 9)], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.keep for r in keep_flags(spark, cmap, docs).collect()}
    assert got == {1: True, 2: False, 3: False, 9: True}  # 9: singleton


def test_fold_lookup_no_exchange_above_map_scan(spark):
    """The 100 TB contract for the endpoint lookup: the base-map scan is
    bucketed (no Exchange up to its join) and partition-pruned to the
    batch's db prefixes."""
    from tests.test_deltadedup import _parent_line

    cmap = init_component_map(spark, "t_plan")
    fold_pairs(
        spark, cmap, _pairs_df(spark, [(i, i + 1000) for i in range(50)])
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        nodes = spark.createDataFrame([(3,), (1003,)], "node bigint")
        base = spark.table(cmap.table).filter(F.col("db").isin(["a", "b"]))
        j = nodes.join(
            base.select(F.col("doc_id").alias("node"), "rep"), "node", "left"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        scans = [
            i
            for i, l in enumerate(lines)
            if "FileScan parquet spark_catalog.default.cmap_t_plan" in l
        ]
        assert scans, plan
        for i in scans:
            assert "Bucketed: true" in lines[i], lines[i]
            assert "PartitionFilters: [db" in lines[i], lines[i]
            jx, hops = i, 0
            while hops < 6:
                parent = _parent_line(lines, jx)
                if not parent or "Join" in parent:
                    break
                assert "Exchange" not in parent, parent
                jx = lines.index(parent)
                hops += 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_store_seed_plus_delta_folds_match_full_components(spark, sf_dir):
    """The closed dedup loop on the benchmark corpus: seed the map from
    the corpus store's own pairs, fold the delta batch's delta_dedup
    pairs — components must equal from-scratch CC over the FULL
    (corpus ∪ delta) pair set mined from a full store."""
    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    delta = d.filter(F.col("doc_id") % 10 == 0)
    store = build_signature_store(spark, corpus, tag="t_cm_seed")
    cmap = init_component_map(spark, "t_cm_seed")
    fold_pairs(spark, cmap, store_self_pairs(spark, store))
    fold_pairs(spark, cmap, delta_dedup(spark, delta, store))
    got = _resolved(spark, cmap)

    full = build_signature_store(spark, d, tag="t_cm_full")
    comps = connected_components_auto(store_self_pairs(spark, full))
    want = sorted(
        (r.node, r.component, r.node == r.component) for r in comps.collect()
    )
    assert got == want and len(got) > 0


def test_streaming_loop_closes_with_component_map(spark, sf_dir, tmp_path):
    """Live loop: dedup -> absorb -> fold per micro-batch. After the
    stream drains, the persisted map must equal from-scratch CC over
    every pair the stream emitted plus the corpus seed."""
    from external_benchmarks_spark.streaming.deltadedup import (
        StreamingDeltaDedup,
    )

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 > 3)
    batches = d.filter(F.col("doc_id") % 10 <= 3).withColumn(
        "_b", (F.col("doc_id") % 10).cast("int")
    )
    store = build_signature_store(spark, corpus, tag="t_cm_live")
    cmap = init_component_map(spark, "t_cm_live")
    seed = store_self_pairs(spark, store)
    fold_pairs(spark, cmap, seed)
    seed_rows = [(r.id_a, r.id_b) for r in seed.collect()]

    src = str(tmp_path / "batches")
    batches.repartition("_b").write.partitionBy("_b").mode("overwrite").parquet(src)
    acc = StreamingDeltaDedup(
        spark,
        store,
        pairs_path=str(tmp_path / "pairs"),
        component_map=cmap,
    )
    q = (
        spark.readStream.schema(batches.drop("_b").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(acc.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_rows = [
        (r.id_a, r.id_b) for r in acc.pairs_df().select("id_a", "id_b").collect()
    ]
    assert stream_rows
    assert _resolved(spark, cmap) == _scratch(spark, seed_rows + stream_rows)
