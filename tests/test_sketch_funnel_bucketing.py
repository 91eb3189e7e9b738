"""Round-4 additions: count-min heavy hitters, event funnels/transitions,
bucketed co-located joins. Properties + physical-plan shapes; exact
cross-engine values are covered by test_oracle_queries.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.functions.text import tokens
from external_benchmarks_spark.operators.funnel import (
    event_funnel,
    event_transitions,
)
from external_benchmarks_spark.operators.sketch import (
    cms_heavy_hitters,
    cms_sketch,
)
from external_benchmarks_spark.pipeline.bucketing import bucketed_pair


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def test_cms_never_underestimates(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    est = {
        r["token"]: r["est_count"]
        for r in cms_heavy_hitters(docs, k=50, width=64).collect()
    }
    exact = {
        r["token"]: r["cnt"]
        for r in docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert est, "no heavy hitters returned"
    for tok, e in est.items():
        assert e >= exact[tok], f"CMS underestimated {tok}: {e} < {exact[tok]}"


def test_cms_keeps_true_heavy_hitters(spark, sf_dir):
    # Estimates never undercount, so the true most-frequent token keeps
    # an estimate >= its true count; only collision-inflated tokens can
    # outrank it, and with depth=4 a token needs ALL rows inflated —
    # vanishingly unlikely to displace the top-1 out of the top-10 even
    # at a deliberately tiny width.
    docs = Catalog(spark, sf_dir).documents
    top = cms_heavy_hitters(docs, k=10, width=64).collect()
    true_top = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(1)
        .collect()[0]
    )
    by_tok = {r["token"]: r["est_count"] for r in top}
    assert true_top["token"] in by_tok
    assert by_tok[true_top["token"]] >= true_top["cnt"]


def test_cms_sketch_is_bounded(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    occ = docs.select(F.explode(tokens("text")).alias("token"))
    sk = cms_sketch(occ, depth=3, width=32)
    rows = sk.collect()
    assert len(rows) <= 3 * 32
    assert {r["row"] for r in rows} <= {0, 1, 2}
    assert all(0 <= r["bucket"] < 32 for r in rows)
    # total mass per row == total token occurrences (each occurrence
    # lands in exactly one bucket per row)
    n_occ = occ.count()
    per_row = {}
    for r in rows:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["cnt"]
    assert all(v == n_occ for v in per_row.values())


def test_cms_sketch_weighted_equals_occurrence_sketch(spark, sf_dir):
    # r16: the exact-candidates path builds the sketch from the
    # per-token count table (one corpus tokenize instead of two). A
    # cell's value is the same BIGINT sum either way — integer
    # regrouping — so the weighted sketch must be row-identical to the
    # occurrence-stream sketch.
    from external_benchmarks_spark.operators.sketch import (
        cms_sketch_weighted,
    )

    docs = Catalog(spark, sf_dir).documents
    occ = docs.select(F.explode(tokens("text")).alias("token"))
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("_tc"))
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(occ, depth=4, width=64).collect()
    }
    weighted = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch_weighted(
            counts, "token", "_tc", depth=4, width=64
        ).collect()
    }
    assert direct == weighted and direct


def test_cms_exact_path_single_corpus_scan(spark, sf_dir):
    # r16 plan shape: candidates="exact" reads/tokenizes the corpus ONCE
    # (the checkpointed per-token count table feeds both the weighted
    # sketch and the candidate set); the mg path keeps its two bounded
    # passes by design.
    docs = Catalog(spark, sf_dir).documents
    plan = _plan(cms_heavy_hitters(docs, k=10, candidates="exact"))
    assert plan.count("Scan parquet") == 0  # both branches read the checkpoint
    assert plan.count("explode(filter(split(lower(") == 0


def test_mg_candidates_yield_same_topk(spark, sf_dir):
    # The production candidate path (bounded per-partition Misra-Gries)
    # must return the same top-k as exact candidates when the counter
    # budget covers the head of the distribution.
    docs = Catalog(spark, sf_dir).documents
    exact = cms_heavy_hitters(docs, k=10, candidates="exact").collect()
    mg = cms_heavy_hitters(docs, k=10, candidates="mg", mg_counters=512).collect()
    assert [(r["token"], r["est_count"]) for r in mg] == [
        (r["token"], r["est_count"]) for r in exact
    ]


def test_mg_candidate_volume_bounded(spark):
    # Skewed synthetic stream: one hot token + a long distinct tail that
    # exceeds the counter budget. MG must keep output <= counters *
    # partitions, actually prune the tail, and never evict the heavy
    # hitter (its count stays positive through every decrement round).
    from external_benchmarks_spark.operators.sketch import mg_candidates

    rows = [("hot",)] * 500 + [(f"tail{i}",) for i in range(400)]
    occ = spark.createDataFrame(rows, "token string").repartition(4)
    cand = [r["token"] for r in mg_candidates(occ, n_counters=16).collect()]
    assert len(cand) <= 16 * 4
    assert len(cand) < 401  # pruned the tail
    assert "hot" in cand


def test_cms_estimate_reports_zero_for_unseen_candidates(spark):
    """General candidate-stream contract: a candidate whose cells no
    occurrence touched must report est 0, not vanish (left join +
    coalesce; an inner join would drop empty cells or the candidate)."""
    from external_benchmarks_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    occ = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "token string"
    )
    sketch = cms_sketch(occ, width=4096)  # wide: collisions improbable
    cand = spark.createDataFrame(
        [("a",), ("never_in_stream_xyz",)], "token string"
    )
    got = {
        r["token"]: r["est_count"]
        for r in cms_estimate(cand, sketch, width=4096).collect()
    }
    assert got["a"] == 2
    assert got["never_in_stream_xyz"] == 0


def test_cms_scoring_broadcasts_sketch(spark, sf_dir):
    plan = _plan(cms_heavy_hitters(Catalog(spark, sf_dir).documents, k=10))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Funnel / transitions
# ---------------------------------------------------------------------------

def test_funnel_counts_monotone(spark, sf_dir):
    row = event_funnel(Catalog(spark, sf_dir).events).collect()[0]
    assert row["stage0_users"] >= row["stage1_users"] >= row["stage2_users"]
    assert row["stage2_users"] >= 0
    ev = Catalog(spark, sf_dir).events
    signup_users = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row["stage0_users"] == signup_users


def test_transitions_conservation(spark, sf_dir):
    ev = Catalog(spark, sf_dir).events
    res = event_transitions(ev).collect()
    total_transitions = sum(r["transitions"] for r in res)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user with k events contributes exactly k-1 transitions
    assert total_transitions == n_events - n_users
    # per-source shares sum to 1
    shares: dict[str, float] = {}
    for r in res:
        shares[r["from_type"]] = shares.get(r["from_type"], 0.0) + r["share_of_from"]
    for src, s in shares.items():
        assert abs(s - 1.0) < 1e-4, (src, s)


def test_transitions_ranged_equals_window_form(spark, sf_dir):
    """The range-partitioned transition counter (hot-key scale path)
    must reproduce the window form row-for-row on real data."""
    from external_benchmarks_spark.operators.funnel import (
        event_transitions_ranged,
    )

    ev = Catalog(spark, sf_dir).events
    want = [tuple(r) for r in event_transitions(ev).collect()]
    got = [tuple(r) for r in event_transitions_ranged(ev).collect()]
    assert want == got


def test_transitions_ranged_survives_single_user_stream(spark):
    """Adversarial hot key: EVERY event belongs to one user, so the
    window form's hash partitioning puts the whole stream on one task.
    The ranged form must still return identical counts — its range
    partitioner splits the user across partitions and the boundary
    stitch rejoins the seams (one per partition border)."""
    import pandas as pd

    from external_benchmarks_spark.operators.funnel import (
        event_transitions_ranged,
    )

    n = 5000
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [42] * n,
            "event_type": [
                ["signup", "click", "purchase", "view"][i % 4]
                for i in range(n)
            ],
            "ts": pd.to_datetime(range(n), unit="s"),
        }
    )
    ev = spark.createDataFrame(pdf).repartition(16)
    want = [tuple(r) for r in event_transitions(ev).collect()]
    got = [
        tuple(r)
        for r in event_transitions_ranged(ev, num_partitions=16).collect()
    ]
    assert want == got
    # every seam is a real transition here: n-1 total transitions
    assert sum(r[2] for r in got) == n - 1


# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------

def test_bucketed_join_no_exchange(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        o, li = bucketed_pair(
            spark,
            c.orders.select("o_orderkey", "o_orderpriority"),
            c.lineitem.select("l_orderkey", "l_extendedprice"),
            left_key="o_orderkey",
            right_key="l_orderkey",
            n_buckets=4,
            tag="t_nx",
        )
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2
        # contrast: the same join off the raw parquet shuffles both sides
        raw = c.orders.select("o_orderkey", "o_orderpriority").join(
            c.lineitem.select("l_orderkey", "l_extendedprice"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert "Exchange" in _plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    c = Catalog(spark, sf_dir)
    o, li = bucketed_pair(
        spark,
        c.orders.select("o_orderkey", "o_orderpriority"),
        c.lineitem.select("l_orderkey", "l_extendedprice"),
        left_key="o_orderkey",
        right_key="l_orderkey",
        n_buckets=4,
        tag="t_eq",
    )
    bucketed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    plain = (
        c.orders.join(
            c.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_pair_reuses_unchanged_layout(spark, sf_dir):
    """With source_paths, the second call must skip both saveAsTable
    writes (fingerprint + catalog hit) and return the existing layout."""
    import os

    from external_benchmarks_spark.pipeline.bucketing import bucket_root

    c = Catalog(spark, sf_dir)
    srcs = [c.path("orders"), c.path("lineitem")]

    def build():
        return bucketed_pair(
            spark,
            c.orders.select("o_orderkey", "o_orderpriority"),
            c.lineitem.select("l_orderkey", "l_extendedprice"),
            left_key="o_orderkey",
            right_key="l_orderkey",
            n_buckets=4,
            tag="t_reuse",
            source_paths=srcs,
        )

    def mtimes():
        out = {}
        for r, _d, fs in os.walk(bucket_root("t_reuse")):
            for f in fs:
                p = os.path.join(r, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    o1, li1 = build()
    n1 = (o1.count(), li1.count())
    before = mtimes()
    o2, li2 = build()
    assert mtimes() == before  # zero files rewritten on reuse
    assert (o2.count(), li2.count()) == n1


def test_bucketed_write_one_file_per_bucket(spark, sf_dir):
    # the repartition-before-bucketBy small-files guard: each bucket is
    # exactly one data file, so scans open n_buckets files, not
    # n_buckets * input_partitions
    import glob
    import os

    from external_benchmarks_spark.pipeline.bucketing import (
        bucket_root,
        bucketed_pair,
    )

    c = Catalog(spark, sf_dir)
    bucketed_pair(
        spark,
        c.orders.select("o_orderkey", "o_orderpriority"),
        c.lineitem.select("l_orderkey", "l_extendedprice"),
        left_key="o_orderkey",
        right_key="l_orderkey",
        n_buckets=4,
        tag="t_files",
    )
    for side in ("bk_left", "bk_right"):
        files = glob.glob(
            os.path.join(bucket_root("t_files"), side, "part-*.parquet")
        )
        assert len(files) == 4, files
