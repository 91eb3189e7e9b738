"""Symmetric-delete fuzzy join: brute-force equality on real vocabulary
(completeness — the whole point), edit-operation coverage, and the
ed=2 shared-variant exclusion."""

from __future__ import annotations

import itertools

from external_benchmarks_spark.operators.fuzzyjoin import fuzzy_term_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(terms):
    out = set()
    for a, b in itertools.combinations(sorted(set(terms)), 2):
        d = _lev(a, b)
        if d <= 1:
            out.add((a, b, d))
    return out


def _spark_pairs(spark, terms):
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    return {
        (r.term_a, r.term_b, r.dist)
        for r in fuzzy_term_pairs(df).collect()
    }


def test_edit_operations_and_exclusions(spark):
    terms = [
        "spark", "spark",          # duplicate input collapses
        "spars",                   # substitution of spark
        "spar",                    # deletion
        "sparks",                  # insertion
        "park",                    # deletion at front (of spark)
        "ab", "ba",                # shared deletion variants but ed=2
        "x", "y",                  # single chars: ed 2 via empty variant
        "unrelated",
    ]
    got = _spark_pairs(spark, terms)
    assert got == _brute(terms)
    assert ("ab", "ba", 2) not in got and not any(
        p[:2] == ("ab", "ba") for p in got
    )
    assert ("park", "spark", 1) in got


def test_matches_brute_force_on_real_vocabulary(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: F.length(t) > 0
    )
    terms = [
        r.term
        for r in docs.select(F.explode(toks).alias("term")).distinct().collect()
    ]
    assert _spark_pairs(spark, terms) == _brute(terms)
