"""Prefix-filtered exact similarity join: completeness vs brute force
(the whole point — no false negatives), boundary thresholds, and
degenerate inputs."""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest

from external_benchmarks_spark.operators.setjoin import (
    PPM,
    allpairs_jaccard_join,
    hash_sample_docs,
)


def _brute_force(rows, n, t_ppm):
    """Python spec: shingle, then test every pair with the same integer
    cross-multiplication the operator uses."""
    sh = {}
    for doc_id, text in rows:
        toks = [w for w in text.lower().split() if w]
        s = {
            " ".join(toks[i : i + n])
            for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()
        if s:
            sh[doc_id] = s
    out = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        i = len(sh[a] & sh[b])
        u = len(sh[a] | sh[b])
        if i * PPM >= t_ppm * u:
            out.add((a, b, i, u))
    return out


def _spark_pairs(spark, rows, n, t_ppm):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = allpairs_jaccard_join(
        df, "doc_id", "text", n=n, threshold_ppm=t_ppm
    ).collect()
    return {(r.id_a, r.id_b, r.inter, r.un) for r in got}


@pytest.mark.parametrize("t_ppm", [300_000, 600_000, 800_000])
def test_matches_brute_force_on_documents(spark, sf_dir, t_ppm):
    rows = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    assert _spark_pairs(spark, rows, 3, t_ppm) == _brute_force(rows, 3, t_ppm)


def test_boundary_overlap_is_kept(spark):
    """A pair sitting EXACTLY at the threshold must survive: J = 3/5
    at t = 0.6 — the case a float ceil can silently drop."""
    rows = [
        (1, "w1 w2 w3 w4 w5 w6"),  # shingles: 4
        (2, "w1 w2 w3 w4 w5 zz"),  # shares 3 of them, union 5
    ]
    got = _spark_pairs(spark, rows, 3, 600_000)
    assert got == {(1, 2, 3, 5)}
    # and just above the ratio it must vanish
    assert _spark_pairs(spark, rows, 3, 600_001) == set()


def test_rare_token_ties_and_duplicates(spark):
    """Identical docs (J = 1), plus docs shorter than the shingle width
    (excluded), plus an unrelated doc — brute-force agreement."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "too short"),
        (4, "unrelated words entirely here"),
    ]
    for t in (200_000, 500_000, 999_999, 1_000_000):
        assert _spark_pairs(spark, rows, 3, t) == _brute_force(rows, 3, t)


def test_hash_sample_is_deterministic(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r.doc_id for r in hash_sample_docs(d, n_docs=20).collect())
    b = sorted(r.doc_id for r in hash_sample_docs(d, n_docs=20).collect())
    assert a == b and len(a) == 20


def test_partition_invariance(spark, sf_dir):
    """The pair set is decided by the canonical (df, token) order and
    integer comparisons — never by partitioning or arrival order."""
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = {
        (r.id_a, r.id_b, r.inter, r.un)
        for r in allpairs_jaccard_join(rows).collect()
    }
    b = {
        (r.id_a, r.id_b, r.inter, r.un)
        for r in allpairs_jaccard_join(rows.repartition(17)).collect()
    }
    assert a == b
