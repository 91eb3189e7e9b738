"""Funnel latency: hand-computed first-touch delays (the funnel itself
is covered by the event_funnel oracle entry)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.funnel import funnel_latency


def test_funnel_latency_hand_case(spark):
    """Delays are first-touch differences; non-converting users (tie or
    missing stage) contribute nothing."""
    base = datetime.datetime(2024, 1, 1)

    def ev(uid, et, secs):
        return (uid, et, base + datetime.timedelta(seconds=secs))

    rows = [
        # u1 converts both hops: signup@0 -> click@10 -> purchase@40
        ev(1, "signup", 0), ev(1, "click", 10), ev(1, "purchase", 40),
        ev(1, "click", 5000),  # later click ignored (first-touch)
        # u2 converts hop 1 only (no purchase)
        ev(2, "signup", 0), ev(2, "click", 30),
        # u3: tie -> no conversion
        ev(3, "signup", 7), ev(3, "click", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).withColumn("ts_us", F.unix_micros("ts"))
    got = {
        r.stage_pair: (r.n_users, r.p50_delay_us, r.avg_delay_us)
        for r in funnel_latency(df).collect()
    }
    assert got == {
        "signup->click": (2, 20_000_000.0, 20_000_000),
        "click->purchase": (1, 30_000_000.0, 30_000_000),
    }
