"""Incremental connected components over a PERSISTED component map —
the missing last step of the production dedup story (round-9 verdict
item #2): ``delta_dedup`` emits each batch's near-dup pairs
incrementally, but deciding what to DROP previously required
``neardup_keep_best``'s from-scratch connected components over the
whole corpus. This module maintains the components themselves
incrementally, so the live loop closes as
dedup → absorb → **fold_pairs** → keep/drop.

Reference parity: the reference's dedup story is batch
(``/root/reference/scripts/generate_benchmark_reports.py`` reports over
full snapshots); this is the engine-added incremental form, same
component semantics (component = MIN doc id reachable through >= tau
pairs — exactly what operators/graph.connected_components computes from
scratch, and what the registry oracle replays with a recursive CTE).

State (two disk artifacts, no driver state):

- **base map** — a bucketed external table ``(doc_id, rep, db)``:
  one row per EDGE-INCIDENT doc (docs never seen in a pair are implicit
  singletons — at 100 TB the map is bounded by the near-dup population,
  not the corpus). Bucketed+sorted by ``doc_id`` and directory-
  partitioned by ``db`` = first hex char of md5(doc_id) — the
  signature-store device: a batch's endpoint lookup joins with NO
  Exchange above the map scan, and the scan is partition-pruned to the
  <= 16 prefixes the batch touches. Base rows are IMMUTABLE once
  written (appends only) — rewrites would be O(touched components)
  scattered across doc-id partitions, so merges go through:
- **relabel table** — a small parquet ``(old_rep, new_rep)``: reps
  deposed by later merges, kept TRANSITIVELY COMPRESSED (every batch
  rewrites it, it is bounded by the number of merged-away components,
  orders of magnitude smaller than the map). Resolution at read time is
  ONE broadcast join, never a loop.

Per batch, :func:`fold_pairs` runs bounded min-label rounds over only
the REP-SPACE graph of the batch (endpoints' current representatives —
touched components, never the corpus): O(batch) work and O(#deposed
reps) state rewrite, independent of map size except for the pruned
endpoint-lookup scan. The fold is IDEMPOTENT: replaying a batch finds
every endpoint already mapped into one component, producing zero
inserts and zero relabels — the at-least-once streaming contract comes
free. :func:`compact_component_map` periodically folds the relabel
table into the base (staged atomic rewrite, the
compact_layout_partitions commit device).

MIN-INVARIANT (why rep-space CC is exact): every rep is the MIN id of
its component. Merging components A, B (reps ra = min A, rb = min B)
with new nodes D gives min(A ∪ B ∪ D) = min(ra, rb, min D) — exactly
the label min-label propagation assigns to the rep-space component
{ra, rb} ∪ D. Induction from the empty map.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from external_benchmarks_spark.pipeline.bucketing import (
    aligned_bucketed_read,
    bucket_root,
    write_bucketed,
)
from external_benchmarks_spark.pipeline.layout import (
    recover_dir_swap,
    swap_dir,
)


def _recover(spark: SparkSession, cmap: "ComponentMap") -> None:
    """Crash recovery before any read/write of the map's two artifacts:
    a compaction (base) or relabel publish crashed mid-swap leaves the
    live dir in a sibling trash — restore it (pipeline/layout helpers).
    Idempotent driver-side listdirs."""
    recover_dir_swap(os.path.join(cmap.root, "base"))
    recover_dir_swap(cmap.relabel_path)
    spark.catalog.refreshTable(cmap.table)


@dataclass(frozen=True)
class ComponentMap:
    """Handles + parameters of a persisted incremental component map."""

    table: str
    relabel_path: str
    n_buckets: int
    root: str
    key_type: str = "bigint"


def _db_col(col: Column) -> Column:
    """The map's 16-way partition key: first hex char of md5(doc_id) —
    same device as the signature store's ``pb``."""
    return F.substring(F.md5(col.cast("string")), 1, 1)


def init_component_map(
    spark: SparkSession,
    tag: str,
    n_buckets: int = 8,
    key_type: str = "bigint",
) -> ComponentMap:
    """Create an EMPTY persisted component map (overwrites any previous
    layout under the same tag). Seed it by folding the corpus's own
    internal pairs (e.g. ``deltadedup.store_self_pairs``) — folding into
    an empty map IS the from-scratch build, so there is no separate
    seeding code path to diverge."""
    root = bucket_root(f"cmap_{tag}")
    cmap = ComponentMap(
        table=f"cmap_{tag}",
        relabel_path=os.path.join(root, "relabel"),
        n_buckets=n_buckets,
        root=root,
        key_type=key_type,
    )
    empty = spark.createDataFrame(
        [], f"doc_id {key_type}, rep {key_type}, db string"
    )
    write_bucketed(
        empty,
        cmap.table,
        key="doc_id",
        n_buckets=n_buckets,
        path=os.path.join(root, "base"),
        partition_col="db",
    )
    import shutil

    # drop the relabel table AND every swap sibling a crashed prior
    # life of this tag may have left — recovery must never resurrect
    # stale state over a freshly initialized map
    for p in (cmap.relabel_path, os.path.join(root, "base")):
        for suffix in ("", ".trash", ".stage", ".tmp", ".compacting"):
            if suffix or p == cmap.relabel_path:
                shutil.rmtree(p + suffix, ignore_errors=True)
    return cmap


def _read_relabel(spark: SparkSession, cmap: ComponentMap) -> DataFrame:
    schema = f"old_rep {cmap.key_type}, new_rep {cmap.key_type}"
    if not os.path.isdir(cmap.relabel_path):  # no fold has run yet
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(cmap.relabel_path)


def fold_pairs(
    spark: SparkSession,
    cmap: ComponentMap,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    prune: bool = True,
) -> None:
    """Fold one batch of near-dup pairs into the persisted map.

    1. endpoint lookup: the batch's distinct endpoints join the base
       map (bucketed — no Exchange above the map scan; partition-pruned
       to the endpoints' ``db`` prefixes) and the broadcast relabel
       table → current representative per endpoint (itself if unseen).
    2. rep-space CC: pairs project to edges between current reps;
       min-label propagation over this BATCH-SIZED graph
       (operators/graph.connected_components_auto — bounded rounds with
       the large-star/small-star escape) yields final labels.
    3. state delta: endpoints not in the base APPEND (insertInto honors
       the bucket spec); existing reps whose label changed become
       relabel rows, transitively compressing the prior relabel table
       (rewritten whole — it is small by construction).

    Idempotent: replaying a folded batch resolves every endpoint into
    one component — zero rep-space edges, zero inserts, zero relabels.
    """
    from external_benchmarks_spark.operators.graph import (
        connected_components_auto,
    )

    _recover(spark, cmap)
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    base = spark.table(cmap.table)
    if prune:
        dbs = [
            r[0]
            for r in nodes.select(_db_col(F.col("node")).alias("db"))
            .distinct()
            .collect()
        ]  # <= 16 values — the prefix alphabet, never the data
        base = base.filter(F.col("db").isin(dbs))
    relabel = _read_relabel(spark, cmap)
    looked = nodes.join(
        base.select(F.col("doc_id").alias("node"), F.col("rep").alias("base_rep")),
        "node",
        "left",
    )
    cur = (
        looked.join(
            F.broadcast(relabel),
            looked["base_rep"] == relabel["old_rep"],
            "left",
        )
        .select(
            "node",
            F.coalesce("new_rep", "base_rep", "node").alias("crep"),
            F.col("base_rep").isNotNull().alias("in_base"),
        )
        .localCheckpoint(eager=True)
    )
    redges = (
        edges.join(
            cur.select(F.col("node").alias("a"), F.col("crep").alias("ra")), "a"
        )
        .join(
            cur.select(F.col("node").alias("b"), F.col("crep").alias("rb")), "b"
        )
        .filter(F.col("ra") != F.col("rb"))
        .select("ra", "rb")
        .distinct()
    )
    labels = connected_components_auto(redges, src="ra", dst="rb").select(
        F.col("node").alias("rnode"), F.col("component")
    )
    # label(endpoint) = component of its rep-space node; isolated
    # rep-space nodes (all pairs already within one component) keep crep
    final = (
        cur.join(F.broadcast(labels), cur["crep"] == labels["rnode"], "left")
        .select(
            "node",
            "in_base",
            "crep",
            F.coalesce("component", "crep").alias("newrep"),
        )
        .localCheckpoint(eager=True)
    )
    # --- state delta 1: deposed reps -> compressed relabel rewrite ---
    deposed = (
        final.filter(F.col("in_base"))
        .select(
            F.col("crep").alias("old_rep"), F.col("newrep").alias("new_rep")
        )
        .filter(F.col("old_rep") != F.col("new_rep"))
        .distinct()
    )
    dep = F.broadcast(
        deposed.select(
            F.col("old_rep").alias("d_old"), F.col("new_rep").alias("d_new")
        )
    )
    new_relabel = (
        relabel.join(dep, relabel["new_rep"] == dep["d_old"], "left")
        .select(
            "old_rep", F.coalesce("d_new", "new_rep").alias("new_rep")
        )
        .unionByName(deposed)
        .distinct()
    )
    # crash-safe publish: stage, then whole-dir swap (a plain overwrite
    # deletes-then-writes — a crash in between loses the relabel table)
    relabel_stage = cmap.relabel_path + ".stage"
    import shutil

    shutil.rmtree(relabel_stage, ignore_errors=True)
    new_relabel.coalesce(1).write.mode("overwrite").parquet(relabel_stage)
    swap_dir(cmap.relabel_path, relabel_stage)
    # --- state delta 2: unseen endpoints APPEND into the bucketed base ---
    # repartition on the bucket key first (the write_bucketed device:
    # repartition's pmod(murmur3, n) IS the bucket function) so one fold
    # adds one file per (db partition, bucket) instead of one per input
    # split per bucket — the r11 soak measured unaligned folds
    # fragmenting the base ~4x faster than the compactor's threshold
    (
        final.filter(~F.col("in_base"))
        .select(
            F.col("node").alias("doc_id"),
            F.col("newrep").alias("rep"),
            _db_col(F.col("node")).alias("db"),
        )
        .repartition(cmap.n_buckets, F.col("doc_id"))
        .write.mode("append")
        .insertInto(cmap.table)
    )
    spark.catalog.refreshTable(cmap.table)


def resolve_components(spark: SparkSession, cmap: ComponentMap) -> DataFrame:
    """(doc_id, rep, keep) for every edge-incident doc, with the relabel
    chain applied (one broadcast join — the relabel table is compressed,
    so there is never a second hop). ``keep`` = the doc is its
    component's representative. Docs absent from the map are implicit
    singletons (keep) by contract."""
    _recover(spark, cmap)
    base = spark.table(cmap.table)
    relabel = _read_relabel(spark, cmap)
    return (
        base.join(
            F.broadcast(relabel), base["rep"] == relabel["old_rep"], "left"
        )
        .select(
            "doc_id",
            F.coalesce("new_rep", "rep").alias("rep"),
        )
        .withColumn("keep", F.col("rep") == F.col("doc_id"))
    )


def keep_flags(
    spark: SparkSession,
    cmap: ComponentMap,
    docs: DataFrame,
    key_col: str = "doc_id",
) -> DataFrame:
    """Join the keep/drop decision onto a doc table: keep unless the doc
    is a non-representative member of some component."""
    resolved = resolve_components(spark, cmap).select(
        F.col("doc_id").alias(key_col), F.col("rep").alias("_rep")
    )
    return (
        docs.join(resolved, key_col, "left")
        .withColumn(
            "keep", F.col("_rep").isNull() | (F.col("_rep") == F.col(key_col))
        )
        .drop("_rep")
    )


def _base_row_count(path: str) -> int:
    """Total base-map rows from parquet FOOTERS (driver-side metadata
    reads, no Spark job) — the denominator for the relabel-fold ratio
    gate."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                continue
            total += pq.ParquetFile(
                os.path.join(dirpath, f)
            ).metadata.num_rows
    return total


def compact_component_map(
    spark: SparkSession,
    cmap: ComponentMap,
    max_files_per_bucket: int | None = None,
    relabel_fold_ratio: float | None = None,
) -> int:
    """Fold the relabel table into the base map (staged atomic rewrite:
    write the resolved map to a staging dir, then swap base dirs with
    two renames — the compact_layout_partitions commit device) and
    clear the relabel table. Returns the number of relabel entries
    folded. Amortized maintenance, single-writer contract — the per-
    batch path never rewrites the base.

    ``max_files_per_bucket`` additionally folds the base's SMALL FILES
    even when the relabel table is empty: every ``fold_pairs`` appends
    one file set per (db partition, bucket), and insert-only batches
    (new pairs, no merges) leave the relabel empty — the round-11
    maintenance soak measured the base growing without bound under
    exactly that workload (files 5 → 35 over 10 cycles) because the
    old relabel-empty early-return skipped the rewrite.

    ``relabel_fold_ratio`` (r15) DEFERS the relabel-only trigger until
    the relabel table exceeds ratio x base rows (footer-counted, no
    job): the r15 per-stage soak split found this compactor was the
    dominant cycle-time slope owner (0.10 -> 7.0 s/cycle at 1.0r, 104 s
    of 580) because every cycle deposes a few reps, and a non-empty
    relabel triggered a FULL O(corpus) base rewrite every cycle — while
    readers (resolve_components / keep_flags / fold_pairs) already
    resolve the relabel chain live, so folding it is pure amortization
    with no correctness deadline. A fragmentation-triggered rewrite
    still folds whatever relabel exists opportunistically (the rewrite
    is happening anyway). None preserves the fold-when-non-empty
    behavior. What remains at scale is the LSM bill stated honestly:
    a periodic O(map) fold whenever buckets fragment past the
    threshold, with flat per-cycle cost between folds."""
    import shutil

    from external_benchmarks_spark.pipeline.bucketing import (
        max_bucket_files,
    )

    _recover(spark, cmap)
    relabel = _read_relabel(spark, cmap)
    n = relabel.count()
    fragmented = (
        max_files_per_bucket is not None
        and max_bucket_files(os.path.join(cmap.root, "base"))
        > max_files_per_bucket
    )
    if n == 0 and not fragmented:
        return 0
    if (
        not fragmented
        and relabel_fold_ratio is not None
        and n <= relabel_fold_ratio
        * _base_row_count(os.path.join(cmap.root, "base"))
    ):
        return 0  # deferred: readers resolve the relabel chain live
    base = spark.table(cmap.table)
    resolved = base.join(
        F.broadcast(relabel), base["rep"] == relabel["old_rep"], "left"
    ).select(
        "doc_id",
        F.coalesce("new_rep", "rep").alias("rep"),
        "db",
    )
    live_path = os.path.join(cmap.root, "base")
    staging_tbl = f"{cmap.table}_cstage"
    staging_path = os.path.join(cmap.root, "base_cstage")
    shutil.rmtree(staging_path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {staging_tbl}")
    with aligned_bucketed_read(spark):  # rewrite-from-itself: keep
        write_bucketed(  # task == bucket so the fold doesn't fragment
            resolved,
            staging_tbl,
            key="doc_id",
            n_buckets=cmap.n_buckets,
            path=staging_path,
            partition_col="db",
        )
    spark.sql(f"DROP TABLE IF EXISTS {staging_tbl}")
    swap_dir(live_path, staging_path)
    spark.catalog.refreshTable(cmap.table)
    if n:
        # relabel is now folded in: clear it via the same staged swap
        # (empty write keeps a schema-carrying file so reads stay cheap)
        relabel_stage = cmap.relabel_path + ".stage"
        shutil.rmtree(relabel_stage, ignore_errors=True)
        spark.createDataFrame(
            [], f"old_rep {cmap.key_type}, new_rep {cmap.key_type}"
        ).coalesce(1).write.mode("overwrite").parquet(relabel_stage)
        swap_dir(cmap.relabel_path, relabel_stage)
    return int(n)
