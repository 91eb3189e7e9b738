"""SCD Type 2: validity-interval versioning semantics on hand-built
cases — chaining, consecutive-duplicate suppression, null-safe change
detection, idempotent re-apply, untouched history."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.scd import scd2_apply, scd2_init


def _key(t):
    return tuple((x is None, x) if x is not None else (True, "") for x in t)


def _rows(df):
    return sorted(
        ((r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in df.collect()),
        key=_key,
    )


def test_scd2_versioning_semantics(spark):
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, None)], "k bigint, attr string"
    )
    current = scd2_init(dim, "k", "attr")
    updates = spark.createDataFrame(
        [
            # key 1: change, duplicate (suppressed), change back
            (1, 10, "plat"), (1, 20, "plat"), (1, 30, "gold"),
            # key 2: first update equals current -> suppressed entirely
            (2, 15, "silver"),
            # key 3: NULL -> value (null-safe change), then value -> NULL
            (3, 5, "bronze"), (3, 25, None),
            # key 4: brand-new key, no current row
            (4, 40, "new"),
        ],
        "k bigint, ts bigint, attr string",
    )
    out = scd2_apply(current, updates, "k", "attr", "ts")
    assert _rows(out) == sorted(
        [
            (1, "gold", 0, 10, False),
            (1, "plat", 10, 30, False),
            (1, "gold", 30, None, True),
            (2, "silver", 0, None, True),  # untouched
            (3, None, 0, 5, False),
            (3, "bronze", 5, 25, False),
            (3, None, 25, None, True),
            (4, "new", 40, None, True),
        ],
        key=_key,
    )
    # exactly one current version per live key; intervals are contiguous
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # re-applying the same batch adds no versions (all suppressed)
    again = scd2_apply(out, updates, "k", "attr", "ts")
    assert _rows(again) == _rows(out)


def test_scd2_ts_tie_normalizes_deterministically(spark):
    """Two updates at the same (key, ts) collapse to MIN(attr)."""
    current = scd2_init(
        spark.createDataFrame([(1, "a")], "k bigint, attr string"), "k", "attr"
    )
    updates = spark.createDataFrame(
        [(1, 10, "z"), (1, 10, "b")], "k bigint, ts bigint, attr string"
    )
    out = _rows(scd2_apply(current, updates, "k", "attr", "ts"))
    assert out == [(1, "a", 0, 10, False), (1, "b", 10, None, True)]


def test_scd2_lookup_point_in_time(spark):
    """Temporal join picks the version valid AT the fact timestamp;
    with an equality key present the broadcast dim plans as a
    BroadcastHashJoin (interval predicate as post-condition)."""
    from external_benchmarks_spark.operators.scd import scd2_lookup

    scd = spark.createDataFrame(
        [
            (1, "a", 0, 10, False),
            (1, "b", 10, None, True),
            (2, "x", 5, None, True),
        ],
        "k bigint, attr string, valid_from bigint, valid_to bigint, is_current boolean",
    )
    facts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 15), (2, 4), (2, 99)], "k bigint, ts bigint"
    )
    out = scd2_lookup(facts, scd, "k", "ts")
    got = sorted((r.k, r.ts, r.attr) for r in out.select("k", "ts", "attr").collect())
    # (2, 4) predates key 2's first version -> drops (inner join)
    assert got == [(1, 5, "a"), (1, 10, "b"), (1, 15, "b"), (2, 99, "x")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:800]
