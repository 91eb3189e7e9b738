"""Mirror of the driver's correctness gate: every queries() entry must
hash-match its oracle_sql() DuckDB result (row count + column names +
order-insensitive canonical values)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)  # exact: we require bit-identical doubles
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _compare(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc, dc = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_oracle_match(name, spark, duck, sf_dir):
    _compare(name, spark, duck, sf_dir)


def test_every_query_runs(spark, sf_dir):
    """Queries without an oracle (approx paths) must still execute."""
    for name, fn in QUERIES.items():
        if name not in ORACLES:
            df = fn(spark, sf_dir)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "score" in df.columns
