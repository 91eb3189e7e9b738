"""Integer ACF: hand-computed values on a synthetic periodic series,
plus invariants on real events."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.timeseries import US_PER_HOUR, hourly_acf


def _series_df(spark, counts):
    """counts[i] events in hour i."""
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, h * US_PER_HOUR + 1),)
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts_us long")


def test_alternating_series_is_negatively_correlated(spark):
    counts = [10, 0] * 12  # period 2
    got = {r.lag: (r.n_pairs, r.acf_ppm) for r in hourly_acf(_series_df(spark, counts), max_lag=4).collect()}
    # perfect alternation: odd lags strongly negative, even strongly
    # positive (magnitudes decay ~ (n-k)/n — the uncorrected estimator)
    assert got[1][1] < -900_000 and got[3][1] < -800_000
    assert got[2][1] > 850_000 and got[4][1] > 750_000


def test_matches_python_reference(spark):
    counts = [3, 7, 1, 0, 9, 4, 4, 2, 8, 5, 0, 6]
    got = {r.lag: (r.n_pairs, r.acf_ppm) for r in hourly_acf(_series_df(spark, counts), max_lag=6).collect()}
    n, t = len(counts), sum(counts)
    m = t // n
    u = [c - m for c in counts]
    den = sum(x * x for x in u)
    for k in range(1, 7):
        num = sum(u[i] * u[i + k] for i in range(n - k))
        # Spark div / DuckDB // truncate toward zero; Python // floors
        q = num * 1_000_000
        expect = q // den if q % den == 0 or q >= 0 else -((-q) // den)
        assert got[k] == (n - k, expect), (k, got[k], expect)


def test_gap_hours_are_zeros(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog

    rows = hourly_acf(Catalog(spark, sf_dir).events).collect()
    assert len(rows) == 24
    for r in rows:
        assert -1_000_000 <= r.acf_ppm <= 1_000_000
