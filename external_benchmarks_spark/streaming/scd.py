"""Streaming SCD Type 2 maintenance: a stream of dimension updates
applied micro-batch by micro-batch with ``operators/scd.scd2_apply``.

Batch/stream equivalence (the lambda-architecture contract the other
streaming operators also honor): applying time-ordered micro-batches
sequentially yields the SAME version table as one batch apply of all
updates — chaining crosses batch boundaries through the current slice,
consecutive-duplicate suppression compares against the persisted
current attribute, and the late-update guard makes replayed batches
(restart/retry) no-ops. The property is asserted in
tests/test_scd.py; the live form is tested over a real file stream.

Persistence: each micro-batch writes a NEW version directory
``v{batch_id}`` and then atomically repoints a ``_CURRENT`` marker
(write-temp + rename). Readers resolve the marker first, so they see
either the old or the new complete version, never a partial write —
the same publish discipline as the upsert table's versioned buckets.
At scale, swap the directory-per-version for a table format's
transaction (Delta/Iceberg MERGE); the per-batch plan is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from external_benchmarks_spark.operators.scd import scd2_apply


def _current_version_path(table_dir: str) -> str | None:
    marker = os.path.join(table_dir, "_CURRENT")
    try:
        with open(marker) as fh:
            name = fh.read().strip()
    except OSError:
        return None
    path = os.path.join(table_dir, name)
    return path if os.path.exists(path) else None


def read_scd2_table(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """The currently-published version, or None before the first batch."""
    path = _current_version_path(table_dir)
    return spark.read.parquet(path) if path else None


def scd2_stream_apply(
    updates_stream: DataFrame,
    table_dir: str,
    key_col: str,
    attr_cols,
    ts_col: str,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Start the maintenance query. ``updates_stream`` is a streaming
    DataFrame of (key, ts, attr) updates; each micro-batch merges into
    the persisted SCD2 table. Returns the StreamingQuery."""
    import tempfile
    import uuid

    from external_benchmarks_spark.operators.scd import scd2_init

    os.makedirs(table_dir, exist_ok=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = read_scd2_table(spark, table_dir)
        if current is None:
            # open nothing: an empty current table with the right shape
            attrs = (
                [attr_cols] if isinstance(attr_cols, str) else list(attr_cols)
            )
            current = scd2_init(
                batch_df.select(key_col, *attrs).limit(0), key_col, attrs
            )
        out = scd2_apply(current, batch_df, key_col, attr_cols, ts_col)
        vname = f"v{batch_id}"
        out.write.mode("overwrite").parquet(os.path.join(table_dir, vname))
        tmp = os.path.join(table_dir, f"._CURRENT.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as fh:
            fh.write(vname)
        os.replace(tmp, os.path.join(table_dir, "_CURRENT"))

    ckpt = checkpoint_dir or os.path.join(
        tempfile.gettempdir(), f"ebs_scd_ckpt_{uuid.uuid4().hex[:8]}"
    )
    writer = (
        updates_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
