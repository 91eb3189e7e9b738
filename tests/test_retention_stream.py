"""Streaming cohort retention must be bit-identical to the batch
operator over the same rows, with state bounded by the distinct
(user, week) activity set."""

from __future__ import annotations

from pyspark.sql import functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.operators.retention import cohort_retention
from external_benchmarks_spark.streaming.retention import StreamingRetention


def test_stream_matches_batch_live(spark, sf_dir, tmp_path):
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts")
    batch = sorted(tuple(r) for r in cohort_retention(ev).collect())

    # drive the SAME rows through a real file stream in several
    # micro-batches (maxFilesPerTrigger chunks the 6 files)
    src = str(tmp_path / "ev")
    ev.withColumn("_b", F.pmod(F.xxhash64("user_id", "ts"), F.lit(6))).repartition(
        "_b"
    ).write.partitionBy("_b").mode("overwrite").parquet(src)
    acc = StreamingRetention(spark)
    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 3)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(acc.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    live = sorted(tuple(r) for r in acc.matrix().collect())
    assert live == batch and len(live) > 0

    # state bound: exactly the distinct (user, week) set, never events
    n_state = acc.state_df().count()
    n_expected = (
        ev.select("user_id", F.date_trunc("week", "ts")).distinct().count()
    )
    assert n_state == n_expected
    assert n_state < ev.count()


def test_update_is_idempotent_on_replay(spark, sf_dir):
    """Replaying a micro-batch (at-least-once delivery) cannot change
    the matrix: the state merge is a set union."""
    ev = Catalog(spark, sf_dir).events.select("user_id", "ts").limit(500)
    acc = StreamingRetention(spark)
    acc.update(ev)
    once = sorted(tuple(r) for r in acc.matrix().collect())
    acc.update(ev)  # replay
    twice = sorted(tuple(r) for r in acc.matrix().collect())
    assert once == twice
