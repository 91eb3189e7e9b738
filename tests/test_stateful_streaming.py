"""Arbitrary stateful streaming: gap sessionization via
applyInPandasWithState, driven through a real multi-micro-batch stream
(file source, maxFilesPerTrigger=1) so both close paths are exercised —
in-batch gap detection and event-time timeout eviction."""

from __future__ import annotations

import os
import tempfile
import time
from datetime import datetime

import pyspark.sql.functions as F

from external_benchmarks_spark.streaming.stateful import stateful_sessionize


def _utc(h, m=0):
    return datetime(2026, 1, 1, h, m)


def _write_batch(path, rows):
    # One FLAT parquet file per micro-batch (the file stream source does
    # not recurse into directory-style spark writes).
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "user_id": [r[0] for r in rows],
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            }
        ),
        path,
    )
    time.sleep(1.1)  # distinct mtimes => deterministic file-source order


def _run_to_list(sessions, timeout=120):
    """Drain an availableNow stateful stream through foreachBatch (the
    memory sink proved lossy for stateful append emissions)."""
    got: list[tuple] = []
    q = (
        sessions.writeStream.foreachBatch(
            lambda df, bid: got.extend(
                (r.user_id, r.session_start, r.session_end, r.n_events)
                for r in df.collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout)
    finally:
        q.stop()
    return got


def test_stateful_sessionize_closes_on_gap_and_timeout(spark):
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # batch 1: user a = 3 events within the gap; user b = 1 event
        _write_batch(
            os.path.join(src, "f1.parquet"),
            [("a", _utc(0, 0)), ("a", _utc(0, 10)), ("a", _utc(0, 20)), ("b", _utc(0, 0))],
        )
        # batch 2: user a returns 2h later -> closes a's first session in-batch;
        # also advances the watermark far past b's gap
        _write_batch(os.path.join(src, "f2.parquet"), [("a", _utc(2, 0))])
        # batch 3: even later event -> watermark move fires pending timeouts
        _write_batch(os.path.join(src, "f3.parquet"), [("c", _utc(4, 0))])

        events = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        got = _run_to_list(
            stateful_sessionize(events, gap_seconds=30 * 60, watermark="10 minutes")
        )
        assert set(got) == {
            # a's first session: closed by the in-batch 2h gap
            ("a", _utc(0, 0), _utc(0, 20), 3),
            # b's singleton: closed by event-time timeout (no later b event)
            ("b", _utc(0, 0), _utc(0, 0), 1),
            # a's 2:00 singleton: timeout fires once wm reaches 3:50
            ("a", _utc(2, 0), _utc(2, 0), 1),
            # c's 4:00 session stays open (timeout 4:30 > final wm) -> absent
        }


def test_stateful_sessionize_agrees_with_batch_operator(spark):
    """Lambda contract: closed sessions from the stateful stream match the
    batch window-function sessionizer on the same data."""
    from external_benchmarks_spark.operators.sessions import sessionize

    rows = []
    for u in range(5):
        base = u * 7
        rows += [(str(u), _utc(0, base)), (str(u), _utc(0, base + 5))]
        rows += [(str(u), _utc(1, base))]  # second session, 1h later
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        _write_batch(os.path.join(src, "f1.parquet"), rows)
        # closer event: far-future ts closes every open session via in-batch gap
        _write_batch(
            os.path.join(src, "f2.parquet"), [(str(u), _utc(10, 0)) for u in range(5)]
        )

        events = (
            spark.readStream.schema("user_id string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        got_rows = _run_to_list(
            stateful_sessionize(events, gap_seconds=30 * 60, watermark="5 minutes")
        )
        agg: dict[str, list[int]] = {}
        for user, _s, _e, n in got_rows:
            cur = agg.setdefault(user, [0, 0])
            cur[0] += 1
            cur[1] += n
        got = {(u, c[0], c[1]) for u, c in agg.items()}

        # batch oracle over the same first-batch rows (the sessions that closed)
        batch_df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.monotonically_increasing_id().alias("event_id"),
        )
        batch = sessionize(batch_df, user_col="user_id", ts_col="ts_us").collect()
        want = {(r.user_id, r.n_sessions, r.total_events) for r in batch}
        assert got == want


def test_transform_with_state_funnel_matches_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas: the running funnel-stage
    tracker, driven availableNow over real testdata events, must end at
    exactly the batch first-touch funnel stage for every user.

    Skip-marked where protobuf (the transformWithState control channel)
    is absent — the sandbox ships without it; the operator raises a
    guided ImportError there (asserted in the fallback branch)."""
    import pytest

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.streaming.stateful import (
        streaming_funnel_stage,
    )

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            streaming_funnel_stage(
                Catalog(spark, sf_dir).events.select(
                    "user_id", "event_type", "ts"
                )
            )
        pytest.skip("protobuf not installed: transformWithState path")

    ev = Catalog(spark, sf_dir).events.select("user_id", "event_type", "ts")
    d = tempfile.mkdtemp(prefix="ebs_tws_")
    src = os.path.join(d, "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)

    got: dict[str, int] = {}
    q = (
        streaming_funnel_stage(stream)
        .writeStream.foreachBatch(
            lambda df, bid: got.update(
                {r.user_id: r.stage for r in df.collect()}
            )
        )
        .option("checkpointLocation", os.path.join(d, "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()

    # batch reference: strictly-ordered first-touch stage per user
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t0"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t2"),
    )
    want: dict[str, int] = {}
    for r in firsts.collect():
        stage = 0
        if r.t0 is not None:
            stage = 1
            if r.t1 is not None and r.t1 > r.t0:
                stage = 2
                if r.t2 is not None and r.t2 > r.t1:
                    stage = 3
        want[str(r.user_id)] = stage
    assert got == want
