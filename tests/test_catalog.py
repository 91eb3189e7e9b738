"""Regression tests for catalog.py events-timestamp normalization.

Round-2 regression: the TIMESTAMP(MICROS) vintage branch left ``ts`` as
timestamp_ntz, so every ``withWatermark("ts", ...)`` streaming op failed
with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. These tests pin the contract:
``ts`` is TIMESTAMP (LTZ) on every vintage, the integer companions are
session-timezone-independent, and unknown vintages fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from external_benchmarks_spark.catalog import Catalog, _normalize_events


def test_events_ts_is_watermarkable_timestamp(spark, sf_dir):
    """ts must be TIMESTAMP (LTZ) — the type withWatermark requires —
    regardless of which vintage the testdata parquet shipped."""
    events = Catalog(spark, sf_dir).events
    dt = dict(events.dtypes)
    assert dt["ts"] == "timestamp"
    assert dt["ts_us"] == "bigint"
    assert dt["ts_ns"] == "bigint"
    # withWatermark itself must accept it (this is the exact r2 failure).
    events.withWatermark("ts", "1 hour")


def test_events_integer_companions_consistent(spark, sf_dir):
    events = Catalog(spark, sf_dir).events
    bad = events.filter(
        (F.col("ts_ns") != F.col("ts_us") * 1000)
        | (F.unix_micros(F.col("ts")) != F.col("ts_us"))
    ).count()
    assert bad == 0


def test_ntz_normalization_is_session_timezone_independent(spark):
    """The epoch derivation for the NTZ vintage must not shift with the
    session timezone (a cast-based derivation would): wall-clock NTZ is
    interpreted as UTC on ANY caller session."""
    ntz = spark.sql(
        "SELECT timestamp_ntz'2024-03-07 12:34:56.789123' AS ts, 1 AS event_id"
    )
    expected_us = 1709814896789123  # 2024-03-07T12:34:56.789123 UTC

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        out_utc = _normalize_events(ntz).select("ts_us").collect()[0][0]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out_ny = _normalize_events(ntz).select("ts_us").collect()[0][0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert out_utc == expected_us
    assert out_ny == expected_us


def test_unknown_ts_vintage_raises(spark):
    """A string (or any unexpected) ts dtype must fail loudly, not
    silently produce null/misscaled epochs."""
    bad = spark.sql("SELECT '2024-01-01' AS ts, 1 AS event_id")
    with pytest.raises(TypeError, match="unsupported dtype"):
        _normalize_events(bad)
