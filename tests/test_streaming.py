"""Upsert path: keyed MERGE semantics over the bucketed table, both as
direct micro-batches and through a real Structured Streaming query."""

from __future__ import annotations

import os
import tempfile
import time

import pyspark.sql.functions as F

from external_benchmarks_spark.pipeline.embedding import embed_fields
from external_benchmarks_spark.streaming.upsert import UpsertTable, run_upsert_stream


def _base(spark, n=100):
    return spark.range(n).select(
        F.col("id"),
        F.concat_ws(" ", F.lit("title"), F.col("id")).alias("title"),
        (F.col("id") * 1.0).alias("price"),
    )


def test_upsert_merge_semantics(spark):
    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=4)
        t.init(_base(spark))
        assert t.read().count() == 100

        # update 5 existing + insert 3 new; duplicate key keeps max op_ts
        updates = spark.createDataFrame(
            [(i, f"updated {i}", 999.0, 1) for i in range(5)]
            + [(100 + i, f"new {i}", 1.0, 1) for i in range(3)]
            + [(0, "stale update", -1.0, 0)],  # older op_ts, must lose
            ["id", "title", "price", "op_ts"],
        )
        t.upsert(updates.drop("op_ts").withColumn("op_ts", F.lit(1)) if False else updates)
        out = t.read()
        assert out.count() == 103
        row0 = out.filter(F.col("id") == 0).collect()[0]
        assert row0.title == "updated 0" and row0.price == 999.0
        assert out.filter(F.col("id") == 101).count() == 1
        # untouched rows intact
        assert out.filter(F.col("id") == 50).collect()[0].title == "title 50"


def test_upsert_with_reembedding(spark):
    """The reference's update includes re-embedding (README.md:69-70)."""
    with tempfile.TemporaryDirectory() as d:
        base = embed_fields(_base(spark, 20), fields=("title",), dim=8)
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=2)
        t.init(base)
        old_emb = t.read().filter(F.col("id") == 1).collect()[0].embedding

        upd = spark.createDataFrame([(1, "changed title", 5.0)], ["id", "title", "price"])
        t.upsert(embed_fields(upd, fields=("title",), dim=8))
        new_emb = t.read().filter(F.col("id") == 1).collect()[0].embedding
        assert list(new_emb) != list(old_emb)  # text change re-embedded
        assert len(new_emb) == 8


def test_streaming_foreachbatch(spark):
    """End-to-end Structured Streaming: rate source -> foreachBatch MERGE."""
    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=2)
        t.init(_base(spark, 10).withColumn("seen", F.lit(-1)))

        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", "50").load()
            .select(
                (F.col("value") % 20).alias("id"),
                F.concat_ws(" ", F.lit("title"), (F.col("value") % 20)).alias("title"),
                F.lit(0.0).alias("price"),
                F.col("value").alias("seen"),
            )
        )
        q = run_upsert_stream(t, stream, d, trigger_seconds=1)
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                try:
                    # A poll can race a concurrent bucket rewrite (snapshot
                    # isolation is what Delta adds on a real deployment —
                    # upsert.py module docstring); retry, don't fail.
                    if t.read().filter(F.col("seen") >= 0).count() > 0:
                        break
                except Exception:
                    pass
                time.sleep(1)
        finally:
            q.stop()
        merged = t.read()
        assert merged.filter(F.col("seen") >= 0).count() > 0
        # keys stayed unique through streamed merges
        assert merged.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_upsert_compact_merges_versions(spark):
    """compact(): one version for every bucket, data unchanged, old
    version dirs vacuumed."""
    import os as _os

    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, _os.path.join(d, "t"), key_col="id", n_buckets=4)
        t.init(_base(spark, 50))
        for i in range(3):  # a few micro-batches -> several versions
            upd = spark.createDataFrame(
                [(i * 10 + j, f"u{i}-{j}", 1.0) for j in range(5)],
                ["id", "title", "price"],
            )
            t.upsert(upd)
        before = sorted((r.id, r.title) for r in t.read().collect())
        t.compact()
        after = sorted((r.id, r.title) for r in t.read().collect())
        assert after == before
        versions = [e for e in _os.listdir(_os.path.join(d, "t")) if e.startswith("v=")]
        assert len(versions) == 1


def test_time_travel_and_vacuum_pruning(spark):
    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=4)
        t.init(_base(spark))
        c0 = t.history()[-1]
        t.upsert(
            spark.createDataFrame(
                [(0, "v2 title", 1.0, 1)], ["id", "title", "price", "op_ts"]
            )
        )
        c1 = t.history()[-1]
        assert c1 > c0
        # latest sees the update; commit 0 still sees the original
        assert t.read().filter(F.col("id") == 0).collect()[0].title == "v2 title"
        old = t.read(at_commit=c0).filter(F.col("id") == 0).collect()[0]
        assert old.title == "title 0"
        assert t.read(at_commit=c0).count() == 100
        # vacuum drops the superseded bucket version -> commit 0 unreadable
        t.vacuum()
        assert c0 not in t.history()
        assert c1 in t.history()
        try:
            t.read(at_commit=c0)
            raise AssertionError("expected vacuumed commit to be unreadable")
        except ValueError:
            pass
        # current snapshot unaffected
        assert t.read().count() == 100


def test_upsert_schema_evolution(spark):
    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=4)
        t.init(_base(spark))
        updates = spark.createDataFrame(
            [(0, "evolved", 5.0, 1, "en")],
            ["id", "title", "price", "op_ts", "lang"],  # NEW column: lang
        )
        t.upsert(updates, evolve_schema=True)
        out = t.read()
        assert "lang" in out.columns
        assert out.filter(F.col("id") == 0).collect()[0].lang == "en"
        # pre-evolution rows (touched and untouched buckets) read as null
        assert out.filter(F.col("lang").isNull()).count() == 99
        assert out.count() == 100
        # compact folds everything to one schema-uniform version
        t.compact()
        out2 = t.read()
        assert out2.count() == 100 and "lang" in out2.columns


def test_concurrent_writer_fails_loudly(spark):
    """Two writers on one table: the second fails with
    ConcurrentWriteError and the table stays uncorrupted."""
    import json as _json

    import pytest as _pytest

    from external_benchmarks_spark.streaming.upsert import (
        LOCKFILE,
        ConcurrentWriteError,
    )

    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "t")
        t1 = UpsertTable(spark, root, key_col="id", n_buckets=4)
        t1.init(_base(spark))
        t2 = UpsertTable(spark, root, key_col="id", n_buckets=4)
        updates = spark.createDataFrame(
            [(0, "w2", 1.0, 1)], ["id", "title", "price", "op_ts"]
        )
        with t1._writer_lease("upsert"):  # writer 1 mid-flight
            with _pytest.raises(ConcurrentWriteError, match="refusing concurrent"):
                t2.upsert(updates)
        # lease released -> writer 2 proceeds; no corruption either way
        t2.upsert(updates)
        out = t2.read()
        assert out.count() == 100
        assert out.filter(F.col("id") == 0).collect()[0].title == "w2"
        assert not os.path.exists(os.path.join(root, LOCKFILE))


def test_stale_lease_is_broken(spark):
    """A crashed writer's orphaned lease (older than the TTL) is broken
    and the new writer proceeds."""
    import json as _json
    import time as _time

    from external_benchmarks_spark.streaming.upsert import LOCKFILE

    with tempfile.TemporaryDirectory() as d:
        root = os.path.join(d, "t")
        t = UpsertTable(spark, root, key_col="id", n_buckets=4, lease_ttl_s=5.0)
        t.init(_base(spark))
        with open(os.path.join(root, LOCKFILE), "w") as f:
            _json.dump({"token": "dead", "pid": -1, "op": "upsert",
                        "ts": _time.time() - 60.0}, f)
        t.upsert(
            spark.createDataFrame([(0, "alive", 2.0, 1)],
                                  ["id", "title", "price", "op_ts"])
        )
        assert t.read().filter(F.col("id") == 0).collect()[0].title == "alive"
        assert not os.path.exists(os.path.join(root, LOCKFILE))


def test_compact_vacuum_reentrant_lease(spark):
    """compact() -> vacuum() nests the lease without deadlock or error."""
    with tempfile.TemporaryDirectory() as d:
        t = UpsertTable(spark, os.path.join(d, "t"), key_col="id", n_buckets=2)
        t.init(_base(spark, 20))
        t.upsert(spark.createDataFrame([(0, "u", 9.0, 1)],
                                       ["id", "title", "price", "op_ts"]))
        t.compact()
        assert t.read().count() == 20


def test_prepare_then_upsert_prepared_equals_plain_upsert(spark):
    """The double-buffered-writer seam: prepare() runs the batch-side
    work without the lease; upsert_prepared(prepare(u)) must produce
    the identical table as upsert(u) — including last-writer-wins and
    the brand-new-key path — and preparing the NEXT batch while the
    current one commits (the pipelined shape serving_write_tier runs)
    must serialize correctly."""
    from concurrent.futures import ThreadPoolExecutor

    with tempfile.TemporaryDirectory() as d:
        a = UpsertTable(spark, os.path.join(d, "a"), key_col="id", n_buckets=4)
        b = UpsertTable(spark, os.path.join(d, "b"), key_col="id", n_buckets=4)
        a.init(_base(spark))
        b.init(_base(spark))

        def batch(j):
            return spark.createDataFrame(
                [(i, f"b{j} upd {i}", float(j), j) for i in range(j, j + 8)]
                + [(200 + j, f"b{j} new", 1.0, j)],
                ["id", "title", "price", "op_ts"],
            )

        # plain path
        for j in range(3):
            a.upsert(batch(j))
        # pipelined path: prepare j+1 while j commits
        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(b.prepare, batch(0))
            for j in range(3):
                prep = nxt.result()
                if j + 1 < 3:
                    nxt = pool.submit(b.prepare, batch(j + 1))
                b.upsert_prepared(prep)

        rows_a = sorted(tuple(r) for r in a.read().drop("v").collect())
        rows_b = sorted(tuple(r) for r in b.read().drop("v").collect())
        assert rows_a == rows_b
        assert len(rows_a) == 103  # 100 base + 3 new keys
