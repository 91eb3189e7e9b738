"""Layout-aware routing (partition pruning observable in the plan),
source registry, and streaming windowed rollup."""

from __future__ import annotations

import os
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.plans.inspect import executed_plan, scan_columns
from external_benchmarks_spark.plans.router import build_indexed_table
from external_benchmarks_spark.sources.registry import DatasetSpec, read_dataset
from external_benchmarks_spark.streaming.windows import stream_hourly_rollup

import __spark_entry__ as entry_mod


def test_indexed_table_partition_pruning(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    with tempfile.TemporaryDirectory() as d:
        t = build_indexed_table(
            spark, emb, os.path.join(d, "idx"),
            partition_col="label", sort_cols=["vec_id"],
        )
        routed = t.query(entry_mod.QVEC, partition_values=[3], k=10)
        rows = routed.collect()
        assert 0 < len(rows) <= 10
        # exactness: routed result == brute force over label==3
        from external_benchmarks_spark.operators.topk import filtered_vector_topk
        expect = filtered_vector_topk(
            emb, entry_mod.QVEC, F.col("label") == 3, k=10
        ).collect()
        assert [r.vec_id for r in rows] == [r.vec_id for r in expect]
        # partition pruning visible: scan carries a partition filter
        plan = executed_plan(t.df().filter(F.col("label") == 3))
        assert "PartitionFilters: [isnotnull(label" in plan or "label#" in plan.split("PartitionFilters")[1][:80]


def test_indexed_table_lsh_routing(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    with tempfile.TemporaryDirectory() as d:
        t = build_indexed_table(
            spark, emb, os.path.join(d, "idx"),
            partition_col="label", sort_cols=["vec_id"], n_planes=6,
        )
        routed = t.query(entry_mod.QVEC, use_lsh=True, lsh_hamming=6, k=10)
        # hamming <= n_planes scans everything -> must equal brute force
        from external_benchmarks_spark.operators.topk import filtered_vector_topk
        expect = filtered_vector_topk(emb, entry_mod.QVEC, None, k=10).collect()
        assert [r.vec_id for r in routed.collect()] == [r.vec_id for r in expect]


def test_indexed_table_ivf_routing(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    with tempfile.TemporaryDirectory() as d:
        t = build_indexed_table(
            spark, emb, os.path.join(d, "idx"),
            partition_col=None, sort_cols=["vec_id"], n_centroids=8,
        )
        # nprobe == all cells scans everything -> must equal brute force
        # (filtered_vector_topk scores by DOT, same as t.query's scorer)
        routed = t.query(entry_mod.QVEC, nprobe=8, k=10)
        from external_benchmarks_spark.operators.topk import filtered_vector_topk

        expect = filtered_vector_topk(emb, entry_mod.QVEC, None, k=10).collect()
        assert [r.vec_id for r in routed.collect()] == [r.vec_id for r in expect]
        # narrow probe prunes: centroid_id lands in PartitionFilters
        narrow = t.query(entry_mod.QVEC, nprobe=2, k=10)
        plan = executed_plan(narrow)
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "centroid_id" in scan.split("PartitionFilters")[1].split("]")[0]


def test_source_registry_formats(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    with tempfile.TemporaryDirectory() as d:
        jpath, cpath = os.path.join(d, "docs.jsonl"), os.path.join(d, "docs.csv")
        docs.write.json(jpath)
        docs.select("doc_id", "lang", "n_chars").write.option("header", "true").csv(cpath)
        back_j = read_dataset(spark, DatasetSpec("j", jpath, "json"))
        assert back_j.count() == docs.count()
        back_c = read_dataset(spark, DatasetSpec("c", cpath, "csv"))
        assert back_c.count() == docs.count()
        assert set(back_c.columns) == {"doc_id", "lang", "n_chars"}
    with pytest.raises(ValueError, match="unsupported format"):
        DatasetSpec("bad", "/x", "avro")


def test_stream_hourly_rollup_matches_batch(spark, sf_dir):
    """Feed the events table through a file stream; the windowed result
    must equal the batch rollup (lambda-architecture contract)."""
    from external_benchmarks_spark.operators.sessions import hourly_rollup

    events = Catalog(spark, sf_dir).events.select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        events.write.parquet(src)
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        out = stream_hourly_rollup(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("hourly_out")
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(d, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {
            (r.hour, r.event_type): (r.cnt, r.sum_value)
            for r in spark.table("hourly_out").collect()
        }
    want = {
        (r.hour, r.event_type): (r.cnt, r.sum_value)
        for r in hourly_rollup(Catalog(spark, sf_dir).events).collect()
    }
    assert got == want


def test_rate_source_streams_through_engine(spark):
    """Built-in rate source -> engine transformations -> foreachBatch:
    proves the streaming surface accepts an unbounded generator source,
    not just file sources."""
    collected = []

    def sink(df, batch_id):
        rows = df.collect()
        if rows:
            collected.append(rows)

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 200)
        .load()
        .withColumn("event_type", F.when(F.col("value") % 2 == 0, "click").otherwise("view"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline and not collected:
            time.sleep(0.5)
    finally:
        q.stop()
    assert collected, "no batches observed from rate source"
    types = {r.event_type for rows in collected for r in rows}
    assert types <= {"click", "view"} and types


def test_jsonl_permissive_quarantines_bad_lines(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from external_benchmarks_spark.sources.registry import read_jsonl_permissive

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "in.jsonl")
        with open(path, "w") as f:
            f.write('{"doc_id": 1, "text": "good row"}\n')
            f.write('{"doc_id": 2 "text": "MISSING COMMA"}\n')  # malformed
            f.write('{"doc_id": 3, "text": "also good"}\n')
            f.write('not json at all\n')
        schema = StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        )
        df = read_jsonl_permissive(spark, path, schema).cache()
        good = df.filter(F.col("_corrupt").isNull())
        bad = df.filter(F.col("_corrupt").isNotNull())
        assert good.count() == 2
        assert bad.count() == 2
        assert {r.doc_id for r in good.collect()} == {1, 3}
        # the raw broken line is preserved for quarantine
        assert any("MISSING COMMA" in r._corrupt for r in bad.collect())
        df.unpersist()


def test_stage_dataset_file_url(spark, sf_dir, tmp_path):
    """Staging (the reference's wget step) via a file:// URL: download,
    atomic rename, reuse-when-already-staged, then read through the
    normal dataset path."""
    import os

    from external_benchmarks_spark.sources.registry import (
        DatasetSpec,
        read_dataset,
        stage_dataset,
    )

    src = os.path.join(sf_dir, "region.parquet")
    url = "file://" + src
    staged = stage_dataset(url, str(tmp_path))
    assert os.path.exists(staged) and staged.endswith("region.parquet")
    assert os.path.getsize(staged) == os.path.getsize(src)
    mtime = os.path.getmtime(staged)
    assert stage_dataset(url, str(tmp_path)) == staged  # no-op re-stage
    df = read_dataset(spark, DatasetSpec("region", staged, "parquet"))
    assert df.count() == spark.read.parquet(src).count()
    # local plain paths pass through
    assert stage_dataset(src, str(tmp_path)) == src


def test_stage_dataset_rejects_object_store_schemes(tmp_path):
    import pytest as _pytest

    from external_benchmarks_spark.sources.registry import stage_dataset

    with _pytest.raises(ValueError):
        stage_dataset("gs://bucket/x.parquet", str(tmp_path))
