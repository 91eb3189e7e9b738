"""Hierarchy closure/rollup: hand-computed trees, a 100-level chain
(the case that kills per-level iteration), and fixpoint behavior."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.hierarchy import (
    hierarchy_closure,
    hierarchy_rollup,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "node long, parent long")


def _vals(spark, nodes):
    return spark.createDataFrame([(n, 1) for n in nodes], "node long, val long")


def test_closure_chain_and_star(spark):
    # chain 3->2->1->0 plus star 10,11 -> 1
    e = _edges(spark, [(3, 2), (2, 1), (1, 0), (10, 1), (11, 1)])
    got = {(r.node, r.anc) for r in hierarchy_closure(e).collect()}
    assert got == {
        (3, 2), (3, 1), (3, 0),
        (2, 1), (2, 0),
        (1, 0),
        (10, 1), (10, 0), (11, 1), (11, 0),
    }


def test_rollup_counts_and_sums(spark):
    e = _edges(spark, [(3, 2), (2, 1), (1, 0), (10, 1), (11, 1)])
    v = _vals(spark, [0, 1, 2, 3, 10, 11])
    got = {
        r.node: (r.subtree_count, r.subtree_sum)
        for r in hierarchy_rollup(e, v).collect()
    }
    assert got == {
        0: (6, 6),  # everything
        1: (5, 5),  # itself + 2,3,10,11
        2: (2, 2),
        3: (1, 1),
        10: (1, 1),
        11: (1, 1),
    }


def test_hundred_level_chain_closes_in_log_rounds(spark):
    """Pointer jumping: a 100-deep chain closes within 7 doubling
    rounds (2^7 = 128 >= 100) — per-level iteration would need 100."""
    e = _edges(spark, [(i, i - 1) for i in range(1, 101)])
    v = _vals(spark, list(range(101)))
    got = {
        r.node: r.subtree_count
        for r in hierarchy_rollup(e, v, max_rounds=7).collect()
    }
    assert got[0] == 101 and got[100] == 1 and got[50] == 51


def test_missing_value_rows_still_aggregate(spark):
    """Synthetic group nodes (no value row) appear with descendant
    totals only."""
    e = _edges(spark, [(5, 99), (6, 99)])
    v = _vals(spark, [5, 6])  # 99 has no value row
    got = {
        r.node: (r.subtree_count, r.subtree_sum)
        for r in hierarchy_rollup(e, v).collect()
    }
    assert got == {5: (1, 1), 6: (1, 1), 99: (2, 2)}
