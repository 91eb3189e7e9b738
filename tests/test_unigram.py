"""Unigram-LM tokenizer training: integer-log2 exactness, Viterbi
semantics (cost-then-shortest-last-piece ties, UNK coverage), driver
fast path vs distributed path equality, segmentation reconstruction."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_ilog2_q16_bounds_and_monotone():
    """floor-ish fixed-point log2: within 2^-16-ish of math.log2 (the
    mantissa truncates, so always <= true log2), monotone, exact on
    powers of two."""
    from external_benchmarks_spark.operators.unigram import ilog2_q16

    prev = -1
    for x in [1, 2, 3, 4, 5, 7, 8, 100, 1023, 1024, 10**6, 10**12, (1 << 62) - 1]:
        got = ilog2_q16(x)
        true = math.log2(x) * 65536
        assert got <= true + 1e-6
        assert got > true - 3.0, (x, got, true)  # <= ~3 q16 ulps low
        assert got >= prev
        prev = got
    assert ilog2_q16(1) == 0
    assert ilog2_q16(1024) == 10 * 65536


def test_viterbi_prefers_cheap_long_pieces():
    from external_benchmarks_spark.operators.unigram import viterbi_word

    cm = {"a": 100, "b": 100, "ab": 150, "ba": 400}
    # ab+ab (300) beats a+b+a+b (400) and a+ba+b (600)
    assert viterbi_word("abab", cm) == ["ab", "ab"]
    # unknown char still segments (UNK cost), coverage is total
    assert viterbi_word("axb", cm) == ["a", "x", "b"]


def test_viterbi_tie_breaks_to_shorter_last_piece():
    from external_benchmarks_spark.operators.unigram import viterbi_word

    # "aa" via piece "aa" (cost 200, last len 2) vs "a"+"a" (cost 200,
    # last len 1): equal total cost, the packed min picks last len 1.
    cm = {"a": 100, "aa": 200}
    assert viterbi_word("aa", cm) == ["a", "a"]


def test_unigram_local_and_distributed_paths_agree(spark):
    """The driver fast path and the distributed HOF loop are the same
    algorithm at different execution sites — identical vocabulary,
    frequencies, and costs."""
    from external_benchmarks_spark.operators.unigram import unigram_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["banana"] * 4 + ["aaaaa"] * 3
    )
    docs = spark.createDataFrame([(corpus,)], "text string")
    local = sorted(tuple(r) for r in unigram_train(docs).collect())
    dist = sorted(
        tuple(r) for r in unigram_train(docs, local_word_limit=0).collect()
    )
    assert local == dist
    assert len(local) > 0
    # all single chars of the corpus are kept
    singles = {p for p, _f, _c in local if len(p) == 1}
    assert singles == set("lowernstidbia".replace(" ", "")) | {"w"} - {" "}


def test_unigram_segment_reconstructs_and_covers(spark, sf_dir):
    """Concatenated pieces reconstruct each document's filtered words;
    wordless documents keep a row with the empty piece list."""
    import re

    from external_benchmarks_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    costs = {
        r["piece"]: int(r["cost_q16"]) for r in unigram_train(docs).collect()
    }
    seg = {r["doc_id"]: list(r["unigram_tokens"])
           for r in unigram_segment(docs, costs).collect()}
    assert len(seg) == docs.count()
    for row in docs.collect():
        words = [
            w
            for w in re.split(r"\s+", (row.text or "").lower())
            if w and re.fullmatch(r"[a-z0-9]+", w)
        ]
        assert "".join(seg[row.doc_id]) == "".join(words)


def test_unigram_empty_and_wordless_input(spark):
    from external_benchmarks_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert unigram_train(empty).count() == 0
    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, None)], "doc_id bigint, text string"
    )
    assert unigram_train(docs).count() == 0
    out = {r["doc_id"]: list(r["unigram_tokens"])
           for r in unigram_segment(docs, {"a": 1}).collect()}
    assert out == {1: [], 2: []}


def test_unigram_train_prunes_to_schedule(spark):
    """Multi-char vocabulary shrinks to the last keep_schedule rung;
    singles always survive."""
    from external_benchmarks_spark.operators.unigram import unigram_train

    corpus = " ".join(["abcd", "abce", "abcf", "bcde"] * 10)
    docs = spark.createDataFrame([(corpus,)], "text string")
    out = unigram_train(docs, keep_schedule=(6, 2)).collect()
    multi = [r for r in out if len(r["piece"]) > 1]
    singles = [r for r in out if len(r["piece"]) == 1]
    assert len(multi) <= 2
    assert {r["piece"] for r in singles} == set("abcdef")
