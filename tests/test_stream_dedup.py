"""Streaming dedup: re-deliveries within the watermark are dropped,
across a real multi-micro-batch stream."""

from __future__ import annotations

import os
import tempfile
import time
from datetime import datetime


def _write(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            }
        ),
        path,
    )
    time.sleep(1.1)


def test_stream_dedup_content_drops_redeliveries(spark):
    from external_benchmarks_spark.streaming.dedup import stream_dedup_content

    t0 = datetime(2026, 1, 1, 0, 0)
    t1 = datetime(2026, 1, 1, 0, 10)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # batch 1: two unique docs + an in-batch duplicate of doc A
        _write(os.path.join(src, "f1.parquet"),
               [(1, "alpha text", t0), (2, "beta text", t0), (3, "alpha text", t0)])
        # batch 2: cross-batch re-delivery of A (within watermark) + new doc
        _write(os.path.join(src, "f2.parquet"),
               [(4, "alpha text", t1), (5, "gamma text", t1)])

        events = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        got: list[tuple] = []
        q = (
            stream_dedup_content(events, watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, bid: got.extend((r.doc_id, r.text) for r in df.collect())
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        texts = sorted(t for _i, t in got)
        assert texts == ["alpha text", "beta text", "gamma text"]
        # the survivor for 'alpha text' is its first delivery
        assert (1, "alpha text") in got and (3, "alpha text") not in got
        assert all(i != 4 for i, _t in got)


def test_checkpoint_restart_no_reprocessing(spark):
    """Exactly-once micro-batches: restarting a stream on the same
    checkpoint must not re-deliver already-committed batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ckpt = os.path.join(d, "ckpt")
        os.makedirs(src)

        def write(name, ids):
            pq.write_table(pa.table({"doc_id": ids}), os.path.join(src, name))
            time.sleep(1.1)

        def run_round(got):
            events = spark.readStream.schema("doc_id long").parquet(src)
            q = (
                events.writeStream.foreachBatch(
                    lambda df, bid: got.extend(r.doc_id for r in df.collect())
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()

        write("f1.parquet", [1, 2, 3])
        first: list[int] = []
        run_round(first)
        assert sorted(first) == [1, 2, 3]

        write("f2.parquet", [4, 5])
        second: list[int] = []
        run_round(second)
        assert sorted(second) == [4, 5]  # f1 NOT re-delivered
