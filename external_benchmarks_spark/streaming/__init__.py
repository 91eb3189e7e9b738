"""Streaming surface: the reference's update workload (README.md:69-70)
as Structured Streaming micro-batch upserts."""

from external_benchmarks_spark.streaming.upsert import (  # noqa: F401
    UpsertTable,
    upsert_batch,
)
