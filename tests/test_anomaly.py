"""Burst/drop anomaly detection: controlled series, cold-start guard,
zero-filled drop detection."""

from __future__ import annotations

from external_benchmarks_spark.operators.anomaly import (
    HOUR_US,
    hourly_burst_anomalies,
)


def _events(spark, counts_by_hour: dict[int, int], etype="A"):
    rows = []
    eid = 0
    for h, n in counts_by_hour.items():
        for i in range(n):
            rows.append((eid, etype, h * HOUR_US + i))
            eid += 1
    return spark.createDataFrame(rows, "event_id bigint, event_type string, ts_us bigint")


def test_burst_and_drop_flagged(spark):
    series = {h: 10 for h in range(12)}
    series[12] = 100  # burst: 10x the steady baseline
    series[13] = 10
    series[14] = 1    # drop: well under half the (burst-inflated) baseline
    ev = _events(spark, series)
    out = {
        r.hour_us // HOUR_US: (r.cnt, r.is_burst, r.is_drop)
        for r in hourly_burst_anomalies(ev, min_history=8).collect()
    }
    assert out[12] == (100, True, False)
    assert 14 in out and out[14][2] is True
    assert all(h >= 8 for h in out)  # cold-start hours never flag


def test_cold_start_never_flags(spark):
    ev = _events(spark, {0: 1, 1: 50, 2: 1, 3: 80})  # wild, but < min_history
    assert hourly_burst_anomalies(ev, min_history=8).count() == 0


def test_gap_hours_count_as_zero_drops(spark):
    """A type that goes silent: the missing hours materialize as
    zero-count rows and flag as drops once history accumulates."""
    series = {h: 10 for h in range(10)}
    series[15] = 10  # hours 10..14 silent -> zeros in the dense grid
    out = hourly_burst_anomalies(_events(spark, series), min_history=8).collect()
    drops = {r.hour_us // HOUR_US for r in out if r.is_drop}
    assert {10, 11, 12, 13, 14} <= drops


def test_negative_timestamps_floor_bucket(spark):
    """Pre-epoch timestamps must bucket by FLOOR division (SQL `//`
    semantics), not truncation toward zero: ts = -1 us belongs to hour
    -1, and must not share hour 0 with ts = +1 us. Uses negative hour
    keys end-to-end (grid, window, flags all on bigints)."""
    from pyspark.sql import functions as F

    from external_benchmarks_spark.operators.anomaly import (
        hourly_burst_anomalies,
    )

    # steady 10/hour for hours -12..-2, then a 100-burst at hour -1:
    # every timestamp strictly negative, several mid-hour (nonzero
    # remainder), so truncation would shift them one hour late.
    series = {h: 10 for h in range(-12, -1)}
    series[-1] = 100
    ev = _events(spark, series)
    assert ev.filter(F.col("ts_us") >= 0).count() == 0
    out = {
        r.hour_us // HOUR_US: (r.cnt, r.is_burst)
        for r in hourly_burst_anomalies(ev, min_history=8).collect()
    }
    assert out == {-1: (100, True)}
