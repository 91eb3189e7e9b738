"""PSI drift monitoring and blocked fuzzy linkage (round-4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.drift import psi_drift
from external_benchmarks_spark.operators.linkage import fuzzy_blocked_pairs


def _drift_df(spark, shift: float):
    # period A: uniform-ish values 0..400; period B: same + `shift`
    rows = [("A", float(v % 400)) for v in range(0, 2000)] + [
        ("B", float(v % 400) + shift) for v in range(0, 2000)
    ]
    return spark.createDataFrame(rows, "period string, value double")


def test_psi_zero_on_identical_distributions(spark):
    out = psi_drift(
        _drift_df(spark, 0.0), "value", F.col("period"), n_bins=10, lo=0, hi=500
    ).collect()
    assert len(out) == 1 and out[0]["period"] == "B"
    assert out[0]["psi_fp"] == 0
    assert out[0]["n_rows"] == 2000


def test_psi_detects_shift(spark):
    small = psi_drift(
        _drift_df(spark, 20.0), "value", F.col("period"), n_bins=10, lo=0, hi=500
    ).collect()[0]["psi"]
    large = psi_drift(
        _drift_df(spark, 100.0), "value", F.col("period"), n_bins=10, lo=0, hi=500
    ).collect()[0]["psi"]
    assert 0 < small < large
    assert large > 0.25  # a 2-bin shift is "major drift" on the PSI scale


def test_psi_handles_out_of_range_values(spark):
    # values beyond [lo, hi) clamp into the edge bins, never a crash
    rows = [("A", -50.0), ("A", 1e9), ("B", -50.0), ("B", 1e9)]
    out = psi_drift(
        spark.createDataFrame(rows, "period string, value double"),
        "value",
        F.col("period"),
    ).collect()
    assert out[0]["psi_fp"] == 0  # identical (clamped) distributions


def test_fuzzy_pairs_vs_bruteforce(spark):
    names = [
        "red widget", "red gadget", "red widgets", "blue widget",
        "red bolt", "blue bolt", "blue colt", "green ring",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_blocked_pairs(df, "p_name", max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = set()
    for a in names:
        for b in names:
            if a < b and a.split()[0] == b.split()[0] and 1 <= lev(a, b) <= 2:
                want.add((a, b, lev(a, b)))
    assert got == want
    # cross-block near-pairs are intentionally invisible (blocking
    # trade-off): "blue bolt" vs "red bolt" absent
    assert ("blue bolt", "red bolt", 2) not in got


def test_fuzzy_cap_is_lossless_when_length_bands_resolve(spark):
    """Level-1 (length band) is drop-FREE: on an oversized block whose
    names spread across lengths, capped output == uncapped output —
    including pairs straddling a band boundary."""
    names = [f"brand {'x' * (i % 30)}item{i:04d}" for i in range(600)]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    uncapped = sorted(
        map(tuple, fuzzy_blocked_pairs(df, "p_name", max_dist=3).collect())
    )
    capped = sorted(
        map(
            tuple,
            fuzzy_blocked_pairs(
                df, "p_name", max_dist=3, max_block_rows=100
            ).collect(),
        )
    )
    assert capped == uncapped


def test_fuzzy_cap_bounds_adversarial_block(spark):
    """10k same-length names sharing one first token: no length split
    can separate them, so the level-2 salt must hard-bound candidate
    fan-out (~n*cap/2 pairs instead of n^2/2)."""
    from external_benchmarks_spark.operators.linkage import (
        _blocked_candidates,
        first_token_block,
    )

    n, cap = 5000, 100
    df = spark.createDataFrame(
        [(f"the item{i:06d}",) for i in range(n)], "p_name string"
    )
    names = df.select(F.col("p_name").alias("name")).distinct().select(
        "name", first_token_block(F.col("name")).alias("blk")
    )
    got = _blocked_candidates(names, 3, cap).count()
    # expected ~ n*cap/2 = 250k; allow hash-variance headroom, and
    # demand far below the uncapped n^2/2 = 12.5M
    assert got <= int(1.5 * n * cap / 2), got
    # capped pairs are still REAL pairs (drop-only): every candidate is
    # intra-block with the length bound satisfied by construction here;
    # spot-check the distance filter end to end returns a plain subset
    sample = fuzzy_blocked_pairs(
        df, "p_name", max_dist=3, max_block_rows=cap
    ).limit(20).collect()
    for r in sample:
        assert r.name_a.split()[0] == r.name_b.split()[0]
        assert 1 <= r.dist <= 3


def test_fuzzy_cap_noop_below_cap(spark):
    """Blocks under the cap take the exact path: identical results with
    and without max_block_rows on a small vocabulary."""
    names = [
        "red widget", "red gadget", "red widgets", "blue widget",
        "red bolt", "blue bolt", "blue colt", "green ring",
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    plain = sorted(
        map(tuple, fuzzy_blocked_pairs(df, "p_name", max_dist=2).collect())
    )
    capped = sorted(
        map(
            tuple,
            fuzzy_blocked_pairs(
                df, "p_name", max_dist=2, max_block_rows=1000
            ).collect(),
        )
    )
    assert plain == capped


def test_bm25_index_matches_direct(spark, sf_dir, tmp_path):
    """The partition-pruned postings layout must reproduce bm25_topk
    bit-for-bit (same fixed-point math, different physical plan)."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        bm25_from_index,
        bm25_topk,
        build_inverted_index,
    )

    import __spark_entry__ as entry_mod

    docs = Catalog(spark, sf_dir).documents
    idx = str(tmp_path / "inv_idx")
    build_inverted_index(docs, idx, n_term_buckets=16)
    direct = bm25_topk(docs, entry_mod.BM25_TERMS, k=20).collect()
    indexed = bm25_from_index(
        spark, idx, entry_mod.BM25_TERMS, k=20, n_term_buckets=16
    ).collect()
    assert [tuple(r) for r in direct] == [tuple(r) for r in indexed]


def test_bm25_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        bm25_from_index,
        build_inverted_index,
    )

    docs = Catalog(spark, sf_dir).documents
    idx = str(tmp_path / "inv_idx2")
    build_inverted_index(docs, idx, n_term_buckets=16)
    df = bm25_from_index(spark, idx, ["the", "data"], n_term_buckets=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    pf = scan.split("PartitionFilters")[1]
    assert "term_bucket" in pf[: pf.index("]")]


def test_ensure_inverted_index_reuses_unchanged_layout(spark, sf_dir, tmp_path):
    """Steady state is a pure read: the second ensure call must detect
    the unchanged source via the fingerprint and NOT rewrite anything."""
    import os

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        bm25_from_index,
        ensure_inverted_index,
    )

    c = Catalog(spark, sf_dir)
    idx = str(tmp_path / "inv_idx_ensure")
    src = [c.path("documents")]
    assert ensure_inverted_index(c.documents, idx, src, n_term_buckets=16)
    before = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _d, fs in os.walk(idx)
        for f in fs
    }
    assert not ensure_inverted_index(c.documents, idx, src, n_term_buckets=16)
    after = {
        os.path.join(r, f): os.stat(os.path.join(r, f)).st_mtime_ns
        for r, _d, fs in os.walk(idx)
        for f in fs
    }
    assert before == after  # zero files rewritten on reuse
    # A parameter change is a layout change -> rebuild triggers.
    assert ensure_inverted_index(c.documents, idx, src, n_term_buckets=8)
    out = bm25_from_index(spark, idx, ["the"], k=5, n_term_buckets=8)
    assert out.count() > 0


def test_append_to_inverted_index_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Delta maintenance contract: full build over docs[A+B] must equal
    build over A then append B — bit-identical BM25 answers, BOTH while
    the delta still lives in append segments AND after compaction folds
    the segments into the bucketed base."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        _segment_files,
        append_to_inverted_index,
        bm25_from_index,
        build_inverted_index,
        compact_inverted_index,
    )

    import __spark_entry__ as entry_mod

    docs = Catalog(spark, sf_dir).documents
    cut = F.col("doc_id") % 10 < 8
    base, delta = docs.where(cut), docs.where(~cut)

    full_idx = str(tmp_path / "idx_full")
    build_inverted_index(docs, full_idx, n_term_buckets=16)
    inc_idx = str(tmp_path / "idx_inc")
    build_inverted_index(base, inc_idx, n_term_buckets=16)
    append_to_inverted_index(spark, inc_idx, delta, n_term_buckets=16)

    import os

    def check():
        for terms in (entry_mod.BM25_TERMS, ["the", "data"]):
            want = bm25_from_index(
                spark, full_idx, terms, k=50, n_term_buckets=16
            ).collect()
            got = bm25_from_index(
                spark, inc_idx, terms, k=50, n_term_buckets=16
            ).collect()
            assert [tuple(r) for r in want] == [tuple(r) for r in got]

    assert _segment_files(os.path.join(inc_idx, "postings"))
    check()  # segment-resident delta
    assert compact_inverted_index(spark, inc_idx, n_term_buckets=16)
    assert not _segment_files(os.path.join(inc_idx, "postings"))
    assert not _segment_files(os.path.join(inc_idx, "dfreq"))
    check()  # compacted — same answers off the pure pruned read
    # compaction is idempotent: a second run is a no-op
    assert compact_inverted_index(spark, inc_idx, n_term_buckets=16) == []


def test_append_writes_segments_compact_touches_only_affected(spark, tmp_path):
    """An append must rewrite ZERO base files (the delta lands in O(1)
    segment files); compaction must then rewrite ONLY the buckets
    containing a delta term."""
    import os

    from external_benchmarks_spark.operators.tfidf import (
        _term_bucket_py,
        append_to_inverted_index,
        build_inverted_index,
        compact_inverted_index,
    )

    base = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha gamma")],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame([(3, "alpha")], "doc_id bigint, text string")
    idx = str(tmp_path / "idx_buckets")
    build_inverted_index(base, idx, n_term_buckets=16)

    def bucket_mtimes(piece):
        out = {}
        droot = os.path.join(idx, piece)
        for d in os.listdir(droot):
            if not d.startswith("term_bucket="):
                continue
            full = os.path.join(droot, d)
            out[d] = max(
                os.stat(os.path.join(full, f)).st_mtime_ns
                for f in os.listdir(full)
                if not f.startswith(("_", "."))
            )
        return out

    before_d = bucket_mtimes("dfreq")
    before_p = bucket_mtimes("postings")
    append_to_inverted_index(spark, idx, delta, n_term_buckets=16)
    assert bucket_mtimes("dfreq") == before_d  # no base file touched
    assert bucket_mtimes("postings") == before_p
    seg_files = [
        f
        for piece in ("postings", "dfreq")
        for f in os.listdir(os.path.join(idx, piece, "_segments"))
        if f.endswith(".parquet")
    ]
    assert len(seg_files) == 2  # O(1) files per append: one per piece

    hot_b = _term_bucket_py("alpha", 16)
    assert compact_inverted_index(spark, idx, n_term_buckets=16) == [hot_b]
    hot = f"term_bucket={hot_b}"
    for piece, before in (("dfreq", before_d), ("postings", before_p)):
        after = bucket_mtimes(piece)
        assert after[hot] > before[hot]
        for b, m in before.items():
            if b != hot:
                assert after[b] == m, f"untouched {piece} bucket {b} rewritten"


def test_gap_filled_hourly_zero_fills(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.sessions import gap_filled_hourly

    ev = Catalog(spark, sf_dir).events
    out = gap_filled_hourly(ev).collect()
    hours = {r["hour"] for r in out}
    types = {r["event_type"] for r in out}
    assert len(out) == len(hours) * len(types)  # dense grid
    assert any(r["cnt"] == 0 for r in out)  # gaps are explicit zeros
    assert sum(r["cnt"] for r in out) == ev.count()  # nothing lost
    zero_rows = [r for r in out if r["cnt"] == 0]
    assert all(r["sum_value"] == 0.0 for r in zero_rows)


def test_append_invalidates_inverted_index_fingerprint(spark, sf_dir, tmp_path):
    """After an in-place append the layout no longer matches the
    recorded source, so ensure_inverted_index must see it as stale and
    rebuild from source instead of serving the appended mix."""
    import os

    from external_benchmarks_spark.operators.tfidf import (
        append_to_inverted_index,
        ensure_inverted_index,
    )
    from external_benchmarks_spark.pipeline.layout import layout_is_current

    from external_benchmarks_spark.catalog import Catalog

    docs = Catalog(spark, sf_dir).documents.limit(50).cache()
    src = str(tmp_path / "src.parquet")
    docs.write.parquet(src)
    idx = str(tmp_path / "idx")
    assert ensure_inverted_index(
        spark.read.parquet(src), idx, [src], n_term_buckets=8
    )
    new = spark.createDataFrame(
        [(10_000, "fresh appended doc")], "doc_id bigint, text string"
    )
    append_to_inverted_index(spark, idx, new, n_term_buckets=8)
    marker = os.path.join(idx, "_layout_fingerprint.json")
    assert not os.path.exists(marker)  # fingerprint dropped
    # next ensure() rebuilds (returns True), restoring source-only state
    assert ensure_inverted_index(
        spark.read.parquet(src), idx, [src], n_term_buckets=8
    )
