"""BPE tokenizer training: hand-verifiable merges on the classic
corpus, segmentation inverse property, single-char/empty edges."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bpe_train_classic_corpus(spark):
    """Sennrich et al.'s running example: 'low' x5 + 'lower' x2 +
    'newest' x6 + 'widest' x3. Most frequent first pair is (e, s)
    from newest/widest (9), then (es, t) (9)."""
    from external_benchmarks_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),)],
        "text string",
    )
    merges = bpe_train(docs, n_merges=4).collect()
    assert [(m.lhs, m.rhs, m.merged) for m in merges[:2]] == [
        ("e", "s", "es"),
        ("es", "t", "est"),
    ]
    assert [m.pair_count for m in merges[:2]] == [9, 9]
    assert [m.step for m in merges] == [1, 2, 3, 4]


def test_bpe_train_overlap_greedy(spark):
    """'aaa' counts the (a,a) pair twice but greedy left-to-right
    merging produces [aa, a] — the REPLACE semantics both engines
    share."""
    from external_benchmarks_spark.operators.bpe import bpe_segment, bpe_train

    docs = spark.createDataFrame([("aaa aaa bb",)], "text string")
    merges = bpe_train(docs, n_merges=1).collect()
    assert (merges[0].lhs, merges[0].rhs) == ("a", "a")
    assert merges[0].pair_count == 4  # two overlapping pairs x two words
    seg = bpe_segment(
        docs, [(m.lhs, m.rhs) for m in merges]
    ).collect()[0].bpe_tokens
    assert seg == ["aa", "a", "aa", "a", "b", "b"]


def test_bpe_segment_reconstructs_words(spark, sf_dir):
    """Segmentation is lossless: concatenating each word's subword
    tokens reproduces the alphanumeric word stream."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.bpe import bpe_segment, bpe_train

    docs = Catalog(spark, sf_dir).documents.limit(50)
    merges = [(m.lhs, m.rhs) for m in bpe_train(docs, n_merges=6).collect()]
    assert len(merges) == 6
    out = bpe_segment(docs, merges).select("doc_id", "text", "bpe_tokens").collect()
    import re

    for r in out:
        words = [
            w for w in re.split(r"\s+", r.text.lower()) if re.fullmatch(r"[a-z0-9]+", w)
        ]
        assert "".join(r.bpe_tokens) == "".join(words), r.doc_id


def test_bpe_single_char_and_empty(spark):
    from external_benchmarks_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame([("a b c",), ("",)], "text string")
    merges = bpe_train(docs, n_merges=3).collect()
    assert merges == []  # no adjacent pairs anywhere -> no rules
