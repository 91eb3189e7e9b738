"""Cohort retention: hand-computed matrix on a synthetic timeline and
structural invariants on real events."""

from __future__ import annotations

import datetime

from external_benchmarks_spark.operators.retention import cohort_retention


def _ev(uid, day):
    # 2024-01-01 is a Monday: week offsets are easy to hand-compute
    return (uid, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day))


def test_hand_computed_matrix(spark):
    rows = [
        # cohort W0: users 1,2,3. user1 active W0+W1+W2, user2 W0+W2, user3 W0 only
        _ev(1, 0), _ev(1, 8), _ev(1, 15),
        _ev(2, 2), _ev(2, 16),
        _ev(3, 4),
        # cohort W1: user 4, active W1 and W3
        _ev(4, 7), _ev(4, 21),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_week), r.week_offset): (
            r.active_users,
            r.cohort_size,
            r.retention_ppm,
        )
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): (3, 3, 1_000_000),
        ("2024-01-01", 1): (1, 3, 333_333),
        ("2024-01-01", 2): (2, 3, 666_666),
        ("2024-01-08", 0): (1, 1, 1_000_000),
        ("2024-01-08", 2): (1, 1, 1_000_000),
    }


def test_invariants_on_real_events(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events
    rows = cohort_retention(ev).collect()
    assert rows
    for r in rows:
        assert 0 <= r.retention_ppm <= 1_000_000
        assert r.active_users <= r.cohort_size
        assert r.week_offset >= 0
        # offset 0 is by definition the full cohort
        if r.week_offset == 0:
            assert r.active_users == r.cohort_size
