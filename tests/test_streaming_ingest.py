"""Streaming ingest arc: micro-batch file consumption must yield the
SAME product table as one batch ingest of the same files, quarantine
included — the batch/stream equivalence contract."""

from __future__ import annotations

import gzip
import json
import os

import pyspark.sql.functions as F


def _write_raw(path: str, lo: int, hi: int, corrupt: bool) -> None:
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        for i in range(lo, hi):
            rec = {
                "parent_asin": f"A{i:05d}",
                "title": f"item {i}",
                "description": [f"desc {i}"],
                "features": ["durable"],
                "average_rating": 1.0 + (i % 9) * 0.5,
                "rating_number": 10 ** (i % 5),
                "price": None if i % 5 == 0 else f"${i}.99",
                "main_category": ["Books", "Automotive"][i % 2],
                "categories": ["Root", f"Sub{i % 3}"],
                "store": f"store{i % 2}",
                "details": {"k": str(i)},
            }
            fh.write(json.dumps(rec) + "\n")
        if corrupt:
            fh.write("{broken json line\n")


def test_streaming_ingest_equals_batch(spark, tmp_path):
    import time as _time

    from external_benchmarks_spark.pipeline.ingest import ingest_products
    from external_benchmarks_spark.streaming.ingest import (
        ingest_stream,
        read_ingested,
    )

    raw = tmp_path / "landing"
    raw.mkdir()
    _write_raw(str(raw / "b0.jsonl.gz"), 0, 12, corrupt=True)
    _time.sleep(1.1)  # file-source ordering is by modification time
    _write_raw(str(raw / "b1.jsonl.gz"), 12, 24, corrupt=False)

    table = str(tmp_path / "table")
    q = ingest_stream(
        spark, str(raw / "*.jsonl.gz"), table, "Books", dim=8,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = read_ingested(spark, table)
    assert got is not None

    # batch reference over the same two files, one at a time (the batch
    # arc stages one URL per call), unioned
    batch_rows = []
    for name in ("b0.jsonl.gz", "b1.jsonl.gz"):
        products, rep = ingest_products(
            spark, "file://" + str(raw / name), str(tmp_path / "stage"),
            "Books", dim=8,
        )
        batch_rows += [tuple(r) for r in products.collect()]
        products.unpersist()  # caller-owned (ingest_products contract)

    got_rows = [tuple(r) for r in got.collect()]
    assert sorted(map(str, got_rows)) == sorted(map(str, batch_rows))

    # quarantine captured exactly the one malformed line
    qdir = os.path.join(table, "_quarantine")
    assert os.path.exists(qdir)
    assert spark.read.parquet(qdir).count() == 1

    # micro-batching actually happened: >= 2 appended file sets
    n_files = len([f for f in os.listdir(os.path.join(table, "products"))
                   if f.startswith("part-")])
    assert n_files >= 2
