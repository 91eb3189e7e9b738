"""Ingest-format round-trips: write a table out as JSONL / CSV / ORC and
read it back with a pinned schema.

The reference ingests JSONL (Amazon Reviews category files, reference
README.md:45-49) and rewrites to Parquet; this module proves the engine's
non-parquet source paths are lossless by round-tripping driver testdata
through each format and letting the oracle queries hash-sum the payload
(any corruption — quoting, type coercion, float formatting — breaks the
cross-engine match against the original parquet).

Scale: writes shard per input partition (no coalesce), reads parallelize
per file; JSONL/CSV are ingest-only formats the pipeline immediately
rewrites to the parquet index layout (pipeline/index.py), so neither is
ever on the query hot path.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def roundtrip_path(fmt: str, tag: str) -> str:
    """Deterministic scratch dir (safe to overwrite on every run)."""
    return os.path.join(tempfile.gettempdir(), f"spark_graft_rt_{fmt}_{tag}")


def write_read(df: DataFrame, spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Write `df` in `fmt`, read it back with df's own schema pinned.

    Pinning the schema (instead of inferSchema) is what a production
    ingest does: the contract comes from the catalog, not the file.
    """
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    reader = spark.read.format(fmt).schema(df.schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def roundtrip_table(
    df: DataFrame, spark: SparkSession, fmt: str, tag: str
) -> DataFrame:
    return write_read(df, spark, fmt, roundtrip_path(fmt, tag))
