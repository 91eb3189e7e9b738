"""Spark 4 Python DataSource connector (sources/pydatasource.py):
partition planning, batch/stream parity, option handling."""

from __future__ import annotations

import tempfile
import uuid

from external_benchmarks_spark.sources.pydatasource import (
    gen_text,
    register,
)


def _batch(spark, n, parts):
    register(spark)
    return (
        spark.read.format("docgen")
        .option("n_docs", n)
        .option("n_partitions", parts)
        .load()
    )


def test_batch_rows_and_partition_planning(spark):
    df = _batch(spark, 100, 4)
    assert df.rdd.getNumPartitions() == 4  # planner decision honored
    rows = sorted((r.doc_id, r.text) for r in df.collect())
    assert len(rows) == 100
    assert rows == [(i, gen_text(i)) for i in range(100)]


def test_uneven_partition_split_covers_all_rows(spark):
    # 10 rows over 4 partitions: ceil split must neither drop nor dupe
    df = _batch(spark, 10, 4)
    assert sorted(r.doc_id for r in df.collect()) == list(range(10))


def test_stream_matches_batch(spark):
    register(spark)
    name = "pyds_" + uuid.uuid4().hex[:8]
    q = (
        spark.readStream.format("docgen")
        .option("n_docs", 120)
        .option("chunk", 50)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = sorted((r.doc_id, r.text) for r in spark.table(name).collect())
    assert got == [(i, gen_text(i)) for i in range(120)]
