"""Sorted-shard export: deterministic range-partitioned TOTAL-ORDER
parquet shards — the last dataset-production step (round-8 verdict
item #6). Training pipelines want "the corpus, globally ordered by X,
in S equal shards, each shard internally sorted" (curriculum order,
dedup-then-pack order, reproducible eval splits).

The naive shapes both fail at 100 TB:

- ``orderBy(...).write`` funnels the corpus through a global sort
  whose output the writer consumes as ONE task stream per file —
  and Spark's ``repartitionByRange`` picks boundaries by SAMPLING, so
  two runs of the same job can cut different shards (non-reproducible
  artifacts).

This module instead applies the ``global_rank`` two-pass device to
writing: exact global rank (range partitions + per-partition window +
driver-side cumsum over #partitions integers), then shard id =
``(rank - 1) * n_shards DIV N`` — a DETERMINISTIC equal-split that
never depends on sampling — then one hash repartition on the shard id
(bounded reducers, no single-partition exchange) with
``sortWithinPartitions`` + ``partitionBy(shard)`` so each shard lands
as ONE internally-sorted parquet file.

Reproducibility contract: ``order_cols`` must be a total order over
the EXPORTED columns (append the row key; rows identical in every
exported column are interchangeable, so ties among them cannot change
any artifact). Shard boundaries, counts, and within-shard order are
then pure functions of the data — the registry entry hashes all three
against a DuckDB replay via ``shard_stats``.

``shard_stats``'s order fingerprint is ``SUM(global_rank * h16)`` per
shard with ``h16`` = the first 16 bits of md5 over the exported row.
SUM is commutative, so what the hash pins is the rank-to-row
ASSIGNMENT (the intended total order: any re-assignment of ranks
among two different rows changes it; re-assigning among identical
rows is a no-op by design) — not the physical byte order of the
written artifact. File-level order is certified separately by
re-reading the shard files positionally (tests/test_export.py's
pyarrow pass). The sum is overflow-safe to ~2^59 at the benchmark
scales (rank < 2^23, h16 < 2^16, shard rows < 2^20; at larger scale
reduce modulo a prime on both engines).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.ranking import global_rank_with_total


def rank_sharded(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    n_shards: int,
    rank_col: str = "global_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Append exact global rank and the deterministic equal-split shard
    id ``(rank - 1) * n_shards DIV N``. Two passes total: N comes free
    from global_rank's partition-count pass (no separate count scan);
    driver data is bounded by the partition count."""
    ranked, n = global_rank_with_total(df, order_cols, rank_col=rank_col)
    # ranks are >= 1, so floor-div == truncating div here (both engines)
    shard = F.floor(
        ((F.col(rank_col) - F.lit(1)) * F.lit(int(n_shards))) / F.lit(int(n))
    ).cast("int")
    return ranked.withColumn(shard_col, shard)


def write_sorted_shards(
    sharded: DataFrame,
    order_cols: Sequence[Column | str],
    out_path: str,
    shard_col: str = "shard",
) -> None:
    """Write each shard as ONE internally-sorted parquet file under
    ``shard=<i>/``. The only exchange is the bounded n_shards-way hash
    repartition; no global sort, no single-partition funnel."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    (
        sharded.repartition(F.col(shard_col))
        .sortWithinPartitions(F.col(shard_col), *cols)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(out_path)
    )


# ---------------------------------------------------------------------------
# Incremental maintenance: merge-append batches into an existing sorted
# layout (round 10) — the export artifact's delta story, completing the
# set (signature store, vector store, component map, inverted index all
# have one). The layout is SELF-DESCRIBING: each shard dir holds one
# internally-sorted file, so its row count is the parquet footer and its
# low boundary is its first row — no manifest to desync.
# ---------------------------------------------------------------------------


def _shard_meta(out_path: str, order_cols: Sequence[str]) -> list[dict]:
    """Driver-side layout scan: per shard, (id, file, n rows, lo tuple).
    O(#shards) footer + first-row reads via pyarrow; returned sorted by
    lo (the shard ORDER — dir numbering is an identity, not a rank:
    splits allocate fresh ids, the order lives in the boundaries)."""
    import os

    import pyarrow.parquet as pq

    metas = []
    for d in os.listdir(out_path):
        if not d.startswith("shard="):
            continue
        full = os.path.join(out_path, d)
        files = [
            f for f in os.listdir(full) if not f.startswith(("_", "."))
        ]
        if len(files) != 1:
            raise ValueError(
                f"sorted layout invariant broken: {full} has {len(files)} "
                "data files (expected exactly one internally-sorted file)"
            )
        pf = pq.ParquetFile(os.path.join(full, files[0]))
        first = pf.read_row_group(0).slice(0, 1)
        metas.append(
            {
                "shard": int(d.split("=", 1)[1]),
                "n": pf.metadata.num_rows,
                "lo": tuple(first.column(c)[0].as_py() for c in order_cols),
            }
        )
    metas.sort(key=lambda m: m["lo"])
    return metas


_APPEND_JOURNAL = "_append_journal.json"
_APPLIED_LEDGER = "_applied_appends.json"


def _read_applied(out_path: str) -> list[str]:
    import json
    import os

    try:
        with open(os.path.join(out_path, _APPLIED_LEDGER)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return []


def _record_applied(out_path: str, batch_id: str, keep: int = 1024) -> None:
    # keep matches the streaming absorbed-batches ledger (1024): a batch
    # replayed after `keep` newer appends would pass the idempotency gate
    # and double-insert, so the horizon IS the rerun-safe contract.
    import json
    import os

    ledger = _read_applied(out_path)
    if batch_id not in ledger:
        ledger.append(batch_id)
    path = os.path.join(out_path, _APPLIED_LEDGER)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ledger[-keep:], fh)
    os.replace(tmp, path)


def recover_append(out_path: str) -> bool:
    """Force-complete an ``append_sorted_shards`` that crashed between
    its journal write and its final cleanup. The journal (written only
    after the staging dir is complete) lists every final shard id and
    whether it has staged contents; recovery swaps the staged dirs that
    survive (a consumed one already landed), retires planned-but-empty
    ids, records the batch in the applied ledger, and drops journal +
    staging. Idempotent. Returns True when anything changed."""
    import json
    import os
    import shutil

    from external_benchmarks_spark.pipeline.layout import (
        recover_partition_swaps,
        swap_partition_dir,
    )

    jp = os.path.join(out_path, _APPEND_JOURNAL)
    if not os.path.exists(jp):
        changed = recover_partition_swaps(out_path)
        orphan = out_path + "_append_staging"
        if os.path.isdir(orphan):
            # no journal => the crash hit before any swap; the layout is
            # untouched and the batch simply re-runs. Gated on WRITER
            # LIVENESS first (append_sorted_shards claims a pid file
            # before staging — a staging write can outlast any fixed
            # age gate at scale; deleting under the live writer would
            # retire its planned shards as empty), then the mtime age
            # gate for claims this host cannot probe. Single-writer is
            # the contract; this protects the reader-during-staging
            # case that contract allows.
            import time

            from external_benchmarks_spark.pipeline.layout import (
                writer_alive,
            )

            try:
                fresh = time.time() - os.path.getmtime(orphan) < 3600
            except OSError:
                fresh = True
            if not fresh and not writer_alive(out_path):
                shutil.rmtree(orphan, ignore_errors=True)
                changed = True
        return changed
    with open(jp) as fh:
        j = json.load(fh)
    recover_partition_swaps(out_path)
    staging = j["staging"]
    staged = set(j["staged"])
    for fid in j["plan"]:
        d = f"shard={fid}"
        src = os.path.join(staging, d)
        if fid in staged:
            if os.path.isdir(src):
                swap_partition_dir(out_path, d, src)
        else:
            swap_partition_dir(out_path, d, None)
    _record_applied(out_path, j["batch_id"])
    os.remove(jp)
    shutil.rmtree(staging, ignore_errors=True)
    return True


def append_sorted_shards(
    spark,
    out_path: str,
    batch: DataFrame,
    order_cols: Sequence[str],
    target_rows: int,
    split_factor: int = 2,
    batch_id: str | None = None,
) -> dict:
    """Merge a new batch into an existing sorted-shard layout: rows
    route to the shard whose key range contains them (lexicographic
    struct compare against the boundary list — keys below the global
    minimum extend the first shard), each TOUCHED shard merge-rewrites
    as one sorted file (staged + two-rename swap, untouched shard files
    byte-identical), and a shard grown past ``split_factor *
    target_rows`` SPLITS into ~target_rows pieces under fresh ids.

    Scale shape: routing is one expression over the batch (the boundary
    list is #shards struct literals — at very large shard counts switch
    to a broadcast range join); the merge reads ONLY touched shard dirs
    (partition-pruned); the within-shard rank window partitions by
    shard, bounded by split_factor * target + batch — never a global
    window. Global ranks are NOT stored: they derive at read time from
    boundary-ordered shard offsets (:func:`sorted_layout_rows`), which
    is what makes an append O(touched shards) instead of O(corpus)
    (an inserted row shifts every later rank; materialized ranks would
    force a full rewrite).

    ``order_cols`` must be a total order over the batch ∪ layout rows
    (the module contract); appends assume key disjointness only in the
    sense that duplicates of an existing tuple are interchangeable.

    RERUN-SAFE (r10 advice): the append is transactional. A content
    digest of the batch (count + bit_xor of xxhash64 over the full row —
    boundary-independent, so it survives the layout changing underneath
    a retry) is checked against the layout's applied ledger; an
    already-applied batch returns a no-op instead of double-inserting.
    The apply phase journals the shard plan after staging completes, so
    a crash mid-swap-loop force-completes on the next call
    (:func:`recover_append`) — the other maintenance paths' at-least-
    once property, which a sequential per-shard swap loop lacked. Pass
    ``batch_id`` to override the digest (e.g. to intentionally append
    identical content twice)."""
    import json
    import math
    import os
    import shutil

    from pyspark.sql.window import Window

    from external_benchmarks_spark.pipeline.layout import (
        swap_partition_dir,
    )

    recover_append(out_path)
    if batch_id is None:
        # count + xor + 32-bit sum of row hashes: xor alone cancels on
        # rows appearing an even number of times ({A,A,B,B} == {C,C,D,D}
        # == 0) — a realistic shape in a dedup pipeline's batches — and
        # the sum breaks exactly that cancellation (overflow-safe to
        # 2^31 rows per batch; identical CONTENT still collides by
        # design — pass batch_id to force an intentional re-append).
        hx = "xxhash64({})".format(", ".join(f"`{c}`" for c in batch.columns))
        dig = batch.agg(
            F.count(F.lit(1)).alias("_n"),
            F.expr(f"bit_xor({hx})").alias("_x"),
            F.expr(f"sum(pmod({hx}, 4294967296))").alias("_s"),
        ).collect()[0]
        batch_id = f"x{dig['_n']}:{dig['_x']}:{dig['_s']}"
    if batch_id in _read_applied(out_path):
        return {"touched": [], "splits": {}, "skipped": batch_id}
    metas = _shard_meta(out_path, order_cols)
    if not metas:
        raise ValueError(f"no sorted layout at {out_path}")
    data_cols = [c for c in batch.columns]
    key = F.struct(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(order_cols)]
    )
    bounds = F.array(
        *[
            F.struct(
                *[
                    F.lit(m["lo"][i])
                    .cast(batch.schema[c].dataType)
                    .alias(f"_k{i}")
                    for i, c in enumerate(order_cols)
                ]
            )
            for m in metas
        ]
    )
    ids = F.array(*[F.lit(m["shard"]) for m in metas])
    pos = F.greatest(
        F.size(F.filter(bounds, lambda b: key >= b)) - F.lit(1), F.lit(0)
    )
    routed = batch.withColumn("shard", F.element_at(ids, pos + F.lit(1)))
    routed_counts = {
        r["shard"]: r["cnt"]
        for r in routed.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()  # <= #shards rows — driver-bounded by construction
    }
    touched = sorted(routed_counts)
    if not touched:
        _record_applied(out_path, batch_id)
        return {"touched": [], "splits": {}}

    # split plan, driver-side over <= #shards counters
    by_id = {m["shard"]: m for m in metas}
    next_id = max(by_id) + 1
    plan: dict = {}  # (shard, sub) -> final id
    splits: dict = {}
    shard_k: list = []  # (shard, k, n) for the sub assignment join
    for s in touched:
        n = by_id[s]["n"] + routed_counts[s]
        k = 1
        if n > split_factor * target_rows:
            k = math.ceil(n / target_rows)
        shard_k.append((s, k, n))
        for sub in range(k):
            if sub == 0:
                plan[(s, sub)] = s
            else:
                plan[(s, sub)] = next_id
                next_id += 1
        if k > 1:
            splits[s] = [plan[(s, sub)] for sub in range(k)]

    old = spark.read.option("basePath", out_path).parquet(
        *(os.path.join(out_path, f"shard={s}") for s in touched)
    ).select(*data_cols, F.col("shard").cast("int").alias("shard"))
    merged = old.unionByName(
        routed.select(*data_cols, F.col("shard").cast("int").alias("shard"))
    )
    w = Window.partitionBy("shard").orderBy(*[F.col(c) for c in order_cols])
    kdf = F.broadcast(
        spark.createDataFrame(shard_k, "shard int, _k int, _n bigint")
    )
    pdf = F.broadcast(
        spark.createDataFrame(
            [(s, sub, fid) for (s, sub), fid in plan.items()],
            "shard int, _sub int, _fid int",
        )
    )
    staged = (
        merged.withColumn("_rn", F.row_number().over(w))
        .join(kdf, "shard")
        .withColumn(
            "_sub",
            F.floor(((F.col("_rn") - 1) * F.col("_k")) / F.col("_n")).cast(
                "int"
            ),
        )
        .join(pdf, ["shard", "_sub"])
        .select(*data_cols, F.col("_fid").alias("shard"))
    )
    # writer pid claim before staging: recover_append's journal-less
    # orphan sweep skips deletion while this process lives, so a staging
    # write longer than the 1h age gate is safe (see layout.claim_writer)
    from external_benchmarks_spark.pipeline.layout import (
        claim_writer,
        release_writer,
    )

    claim_writer(out_path)
    try:
        staging = out_path + "_append_staging"
        shutil.rmtree(staging, ignore_errors=True)
        (
            staged.repartition(F.col("shard"))
            .sortWithinPartitions("shard", *[F.col(c) for c in order_cols])
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(staging)
        )
        fids = sorted(set(plan.values()))
        staged_fids = [
            fid
            for fid in fids
            if os.path.isdir(os.path.join(staging, f"shard={fid}"))
        ]
        jp = os.path.join(out_path, _APPEND_JOURNAL)
        tmp = jp + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"plan": fids, "staged": staged_fids, "staging": staging,
                 "batch_id": batch_id},
                fh,
            )
        os.replace(tmp, jp)  # the commit point
        for fid in fids:
            d = f"shard={fid}"
            src = os.path.join(staging, d)
            swap_partition_dir(
                out_path, d, src if os.path.isdir(src) else None
            )
        _record_applied(out_path, batch_id)
        os.remove(jp)
        shutil.rmtree(staging, ignore_errors=True)
    finally:
        release_writer(out_path)
    return {"touched": touched, "splits": splits}


def sorted_layout_rows(
    spark,
    out_path: str,
    order_cols: Sequence[str],
    rank_col: str = "global_rank",
) -> DataFrame:
    """Read the layout back with DERIVED exact global ranks: shards
    ordered by their lo boundary contribute cumulative offsets
    (driver-side, O(#shards) footers); within-shard position is a
    bounded partitioned window. Equal to a from-scratch
    ``row_number() OVER (ORDER BY order_cols)`` — tested and oracled."""
    from pyspark.sql.window import Window

    recover_append(out_path)
    metas = _shard_meta(out_path, order_cols)
    offs = []
    acc = 0
    for m in metas:
        offs.append((m["shard"], acc))
        acc += m["n"]
    df = spark.read.option("basePath", out_path).parquet(out_path)
    w = Window.partitionBy("shard").orderBy(*[F.col(c) for c in order_cols])
    odf = F.broadcast(
        spark.createDataFrame(offs, "shard int, _off bigint")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .join(odf, "shard")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_rn", "_off", "shard")
    )


def shard_stats(
    sharded: DataFrame,
    hash_cols: Sequence[str],
    key_col: Column | str,
    rank_col: str = "global_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard fingerprint row: (shard, n_rows, rank_min, rank_max,
    key_min, key_max, order_hash). ``rank_max - rank_min + 1 ==
    n_rows`` certifies contiguity; ``order_hash`` pins the exact
    within-shard order (see module docstring). One map-side-combinable
    groupBy over the sharded frame."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h16 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    return sharded.groupBy(F.col(shard_col).cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(rank_col).alias("rank_min"),
        F.max(rank_col).alias("rank_max"),
        F.min(key).alias("key_min"),
        F.max(key).alias("key_max"),
        F.sum(F.col(rank_col) * h16).alias("order_hash"),
    )
