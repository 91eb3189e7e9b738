"""Unit semantics for the corpus-quality operators (operators/quality.py):
Gopher rule metrics on hand-built texts with known counts, and DSIR
importance-weight signs on a corpus with a planted target distribution."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.quality import dsir_weights, gopher_rules

GOOD = " ".join(["the cat and the dog have fun with good food"] * 6)  # 60 words


def test_gopher_keep_and_reject(spark):
    docs = spark.createDataFrame(
        [
            (1, GOOD),                      # passes every rule
            (2, "the cat and the dog"),     # fails MIN_WORDS
            (3, None),                      # null text: zero metrics, reject
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert got[1].keep and got[1].n_words == 60 and got[1].stop_hits >= 2
    assert not got[2].keep and got[2].n_words == 5
    assert not got[3].keep and got[3].n_words == 0 and got[3].mean_word_len == 0.0


def test_gopher_symbol_and_alpha_metrics(spark):
    # tokens: x ... y # z .....  -> 6 words, 1 '#', 2 non-overlapping '...'
    docs = spark.createDataFrame([(1, "x ... y # z .....")], ["doc_id", "text"])
    r = gopher_rules(docs).collect()[0]
    assert r.n_words == 6
    assert r.symbol_ratio == 3 / 6
    assert r.alpha_word_frac == 3 / 6  # x, y, z only
    assert not r.keep


def test_dsir_weight_signs(spark):
    # Target docs are built from 'good data' bigrams, raw-only docs from
    # 'junk spam' bigrams; a target-looking doc must score positive and a
    # raw-looking doc negative, with identical docs scoring identically.
    docs = spark.createDataFrame(
        [
            (1, "good data good data good data", True),
            (2, "good data good data good data", True),
            (3, "junk spam junk spam junk spam", False),
            (4, "good data good data good data", False),  # raw doc that looks target
        ],
        ["doc_id", "text", "tgt"],
    )
    got = {r.doc_id: r for r in dsir_weights(docs, F.col("tgt")).collect()}
    assert got[1].n_bigrams == 5
    assert got[1].weight_fp == got[2].weight_fp == got[4].weight_fp
    # Laplace smoothing over 256 buckets dominates absolute values at toy
    # scale, so assert the ordering the resampler actually consumes:
    # target-looking docs outrank raw-only docs.
    assert got[4].avg_logratio > got[3].avg_logratio
