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


def test_scd2_batch_split_equivalence(spark):
    """Applying time-ordered batches sequentially equals one batch
    apply of everything — the streaming contract."""
    from external_benchmarks_spark.operators.scd import scd2_apply, scd2_init

    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, attr string")
    init = scd2_init(dim, "k", "attr")
    all_updates = [
        (1, 10, "x"), (1, 20, "x"), (2, 30, "b"), (1, 40, "a"),
        (3, 50, "n"), (2, 60, "c"), (3, 70, "n"), (1, 80, "z"),
    ]
    schema = "k bigint, ts bigint, attr string"
    one_shot = _rows(
        scd2_apply(init, spark.createDataFrame(all_updates, schema), "k", "attr", "ts")
    )
    b1 = [u for u in all_updates if u[1] < 45]
    b2 = [u for u in all_updates if u[1] >= 45]
    step1 = scd2_apply(init, spark.createDataFrame(b1, schema), "k", "attr", "ts")
    step2 = scd2_apply(step1, spark.createDataFrame(b2, schema), "k", "attr", "ts")
    assert _rows(step2) == one_shot


def test_scd2_streaming_file_batches(spark, tmp_path):
    """Live file-stream maintenance: two update files processed as
    separate micro-batches (maxFilesPerTrigger=1) publish versioned
    table states; the final published table equals the one-shot batch
    apply, and the _CURRENT marker always points at a complete write."""
    import time as _time

    from external_benchmarks_spark.operators.scd import scd2_apply, scd2_init
    from external_benchmarks_spark.streaming.scd import (
        read_scd2_table,
        scd2_stream_apply,
    )

    schema = "k bigint, ts bigint, attr string"
    b1 = [(1, 10, "x"), (2, 20, "y")]
    b2 = [(1, 30, "z"), (3, 40, "n")]
    upd_dir = tmp_path / "updates"
    upd_dir.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(upd_dir / "b0")
    )
    _time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(upd_dir / "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(upd_dir / "*"))
    )
    table_dir = str(tmp_path / "scd_table")
    q = scd2_stream_apply(stream, table_dir, "k", "attr", "ts")
    q.awaitTermination(120)

    got = read_scd2_table(spark, table_dir)
    assert got is not None
    init = scd2_init(
        spark.createDataFrame([], "k bigint, attr string"), "k", "attr"
    )
    want = scd2_apply(
        init, spark.createDataFrame(b1 + b2, schema), "k", "attr", "ts"
    )
    assert _rows(got) == _rows(want)
    # versioned publish: at least two version dirs + marker resolves
    import os

    versions = [d for d in os.listdir(table_dir) if d.startswith("v")]
    assert len(versions) >= 2


def test_scd2_new_key_null_first_attr_opens_version(spark):
    """A brand-new key whose FIRST update attr is NULL must still open
    a version: 'no prevailing state' is an explicit flag, not inferred
    from attribute nullness (a COALESCE over attr values conflates the
    two and silently drops the key)."""
    current = scd2_init(
        spark.createDataFrame([], "k bigint, attr string"), "k", "attr"
    )
    updates = spark.createDataFrame(
        [(7, 10, None), (7, 20, "x")], "k bigint, ts bigint, attr string"
    )
    out = scd2_apply(current, updates, "k", "attr", "ts")
    assert _rows(out) == sorted(
        [(7, None, 10, 20, False), (7, "x", 20, None, True)], key=_key
    )
    # idempotent re-apply still holds with the NULL-opening row
    again = scd2_apply(out, updates, "k", "attr", "ts")
    assert _rows(again) == _rows(out)


def test_scd2_null_in_update_chain(spark):
    """cur='x', updates (NULL, 'x'): the NULL versions, and the 'x'
    after it is a REAL change vs the NULL predecessor — comparing
    against COALESCE(lag, cur) would wrongly suppress it."""
    current = scd2_init(
        spark.createDataFrame([(1, "x")], "k bigint, attr string"), "k", "attr"
    )
    updates = spark.createDataFrame(
        [(1, 10, None), (1, 20, "x")], "k bigint, ts bigint, attr string"
    )
    out = scd2_apply(current, updates, "k", "attr", "ts")
    assert _rows(out) == sorted(
        [(1, "x", 0, 10, False), (1, None, 10, 20, False),
         (1, "x", 20, None, True)],
        key=_key,
    )


def _rows2(df):
    return sorted(
        (
            (r.k, r.a1, r.a2, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()
        ),
        key=_key,
    )


def test_scd2_multi_attribute_tuple_versioning(spark):
    """attr_cols as a sequence: a change in ANY attribute opens a
    version; rows equal on the WHOLE tuple suppress; NULLs inside the
    tuple are null-safe; re-apply is a no-op."""
    dim = spark.createDataFrame(
        [(1, "gold", "eu"), (2, "silver", None)],
        "k bigint, a1 string, a2 string",
    )
    current = scd2_init(dim, "k", ["a1", "a2"])
    updates = spark.createDataFrame(
        [
            # key 1: a2-only change, then exact-duplicate tuple, then
            # a1-only change
            (1, 10, "gold", "us"), (1, 20, "gold", "us"), (1, 30, "plat", "us"),
            # key 2: tuple equal to current (incl. NULL a2) -> suppressed
            (2, 15, "silver", None),
            # key 2 later: NULL a2 -> value is a change
            (2, 25, "silver", "eu"),
            # key 3: brand-new key with an all-NULL tuple still opens
            (3, 40, None, None),
        ],
        "k bigint, ts bigint, a1 string, a2 string",
    )
    out = scd2_apply(current, updates, "k", ["a1", "a2"], "ts")
    assert _rows2(out) == sorted(
        [
            (1, "gold", "eu", 0, 10, False),
            (1, "gold", "us", 10, 30, False),
            (1, "plat", "us", 30, None, True),
            (2, "silver", None, 0, 25, False),
            (2, "silver", "eu", 25, None, True),
            (3, None, None, 40, None, True),
        ],
        key=_key,
    )
    again = scd2_apply(out, updates, "k", ["a1", "a2"], "ts")
    assert _rows2(again) == _rows2(out)


def test_scd2_lookup_asof_equals_interval_join(spark):
    """The as-of reduction (non-broadcast scale path) must be
    result-identical to the interval join, including versions whose
    attributes are NULL (the struct packing keeps last(ignorenulls)
    from resurrecting an older version's value)."""
    from pyspark.sql import functions as F

    from external_benchmarks_spark.operators.scd import (
        scd2_apply,
        scd2_init,
        scd2_lookup,
        scd2_lookup_asof,
    )

    dim = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None)], "k bigint, a1 string, a2 string"
    )
    updates = spark.createDataFrame(
        [
            (1, 10, "a", None),   # a2 -> NULL versions
            (1, 20, "c", "y"),
            (2, 15, "b", "z"),
            (3, 30, None, None),  # brand-new key, all-NULL tuple
            (3, 40, "n", "m"),
        ],
        "k bigint, ts bigint, a1 string, a2 string",
    )
    scd = scd2_apply(
        scd2_init(dim, "k", ["a1", "a2"]), updates, "k", ["a1", "a2"], "ts"
    )
    facts = spark.createDataFrame(
        [(k, ts) for k in (1, 2, 3, 4) for ts in (5, 10, 12, 18, 25, 35, 50)],
        "k bigint, fts bigint",
    )
    a = scd2_lookup(facts, scd, "k", "fts")
    b = scd2_lookup_asof(facts, scd, "k", "fts")
    cols = ["k", "fts", "a1", "a2", "valid_from", "valid_to"]
    ra = sorted(tuple(r) for r in a.select(cols).collect())
    rb = sorted(tuple(r) for r in b.select(cols).collect())
    assert ra == rb
    # the NULL-attr version is actually exercised at (1, 12..18)
    assert any(r[0] == 1 and r[3] is None for r in ra)
    # and facts before a key's first version dropped in both
    assert all(not (r[0] == 3 and r[1] < 30) for r in ra)
    # plan: the as-of form must not broadcast the dimension
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_scd2_lookup_asof_raises_on_fact_version_name_clash(spark):
    """A fact column named like an unpacked version column (e.g.
    valid_from) would be silently overwritten by the struct unpack —
    the as-of path must refuse instead of diverging from
    scd2_lookup's duplicate-column behavior."""
    import pytest

    from external_benchmarks_spark.operators.scd import (
        scd2_init,
        scd2_lookup_asof,
    )

    dim = spark.createDataFrame([(1, "a")], "k bigint, a1 string")
    scd = scd2_init(dim, "k", ["a1"])
    facts = spark.createDataFrame(
        [(1, 10, 99)], "k bigint, fts bigint, valid_from bigint"
    )
    with pytest.raises(ValueError, match="valid_from"):
        scd2_lookup_asof(facts, scd, "k", "fts")


def test_scd2_collision_row_vs_column_rules_differ(spark):
    """Two same-(key, ts) updates differing in BOTH attributes: the
    default row rule keeps the lexicographically-least REAL input row
    (a1, b2); legacy per-column MIN synthesizes (a1, b1) — a tuple no
    update carried. NULLs: SQL MIN skips them, NULLS FIRST prefers
    them."""
    from external_benchmarks_spark.operators.scd import scd2_apply, scd2_init

    current = scd2_init(
        spark.createDataFrame([], "k bigint, x string, y string"),
        "k",
        ["x", "y"],
    )
    updates = spark.createDataFrame(
        [
            (1, 10, "a1", "b2"),
            (1, 10, "a2", "b1"),
            # key 2: NULL in one attribute of one colliding row
            (2, 10, "m", None),
            (2, 10, "n", "q"),
        ],
        "k bigint, ts bigint, x string, y string",
    )
    row = {
        (r.k): (r.x, r.y)
        for r in scd2_apply(current, updates, "k", ["x", "y"], "ts").collect()
    }
    col = {
        (r.k): (r.x, r.y)
        for r in scd2_apply(
            current, updates, "k", ["x", "y"], "ts", collision="column"
        ).collect()
    }
    assert row[1] == ("a1", "b2")   # a real input row
    assert col[1] == ("a1", "b1")   # synthesized: min-x, min-y
    assert row[2] == ("m", None)    # least x wins; its real NULL y survives
    assert col[2] == ("m", "q")     # MIN skips the NULL y
    import pytest

    with pytest.raises(ValueError, match="collision"):
        scd2_apply(current, updates, "k", ["x", "y"], "ts", collision="bogus")
