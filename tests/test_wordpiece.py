"""WordPiece tokenizer: positional-symbol training (likelihood-gain
q36 integer scoring, ## continuation semantics), driver fast path vs
distributed path equality, greedy longest-match segmentation (UNK
whole-word rule), reconstruction."""

from __future__ import annotations

import re

import pyspark.sql.functions as F


def _mk_docs(spark, corpus: str):
    return spark.createDataFrame([(1, corpus)], "doc_id bigint, text string")


def test_train_local_scores_and_merged_symbols(spark):
    """Likelihood-gain picks rare-symbol pairs over frequent raw pairs,
    and merged symbols strip the continuation marker of the right side."""
    from external_benchmarks_spark.operators.wordpiece import _train_local

    # 'ab' appears 10x (a:10, ##b:10 -> score c/(fa*fb)=10/100)
    # 'xy' appears 2x  (x:2,  ##y:2  -> score 2/4 = 0.5) -> xy wins
    rows = [{"word": "ab", "cnt": 10}, {"word": "xy", "cnt": 2}]
    merges = _train_local(rows, 2)
    assert merges[0][1:4] == ("x", "##y", "xy")
    assert merges[1][1:4] == ("a", "##b", "ab")
    # q36 scores are exact integers
    assert merges[0][5] == (2 << 36) // (2 * 2)
    assert merges[1][5] == (10 << 36) // (10 * 10)


def test_positional_symbols_are_distinct(spark):
    """'l' word-initial and '##l' continuation count separately: a
    corpus where 'l' only ever continues must never merge a plain 'l'
    pair."""
    from external_benchmarks_spark.operators.wordpiece import wordpiece_train

    docs = _mk_docs(spark, " ".join(["hello"] * 4 + ["help"] * 2))
    out = wordpiece_train(docs, 6).collect()
    for r in out:
        for s in (r["lhs"], r["rhs"]):
            if s.replace("#", "").startswith("l"):
                assert s.startswith("##"), r


def test_local_and_distributed_paths_agree(spark):
    from external_benchmarks_spark.operators.wordpiece import wordpiece_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["banana"] * 4 + ["aaaaa"] * 3
    )
    docs = _mk_docs(spark, corpus)
    local = [tuple(r) for r in wordpiece_train(docs, 6).collect()]
    dist = [
        tuple(r)
        for r in wordpiece_train(docs, 6, local_word_limit=0).collect()
    ]
    assert local == dist
    assert len(local) == 6


def test_greedy_word_longest_match_and_unk():
    from external_benchmarks_spark.operators.wordpiece import greedy_word

    vocab = {"h", "he", "hell", "##o", "##llo", "l", "##l"}
    # longest-match-first: 'hell' beats 'he'; then '##o'
    assert greedy_word("hello", vocab, 4) == ["hell", "##o"]
    # matchless position (no '##e') -> whole word UNK, not partial
    assert greedy_word("hex", vocab, 4) == ["[UNK]"]
    # continuation pieces never match at word start
    assert greedy_word("llo", vocab, 4) == ["l", "##l", "##o"]


def test_segment_matches_driver_twin_and_reconstructs(spark, sf_dir):
    from external_benchmarks_spark.operators.wordpiece import (
        _strip_cont,
        greedy_word,
        wordpiece_segment,
        wordpiece_train,
        wordpiece_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    merges = wordpiece_train(docs, 8)
    vocab = wordpiece_vocab(docs, merges)
    vs = set(vocab)
    max_len = max(len(_strip_cont(p)) for p in vs)
    seg = {
        r["doc_id"]: list(r["wp_tokens"])
        for r in wordpiece_segment(docs, vocab).collect()
    }
    assert len(seg) == docs.count()
    for row in docs.collect():
        words = [
            w
            for w in re.split(r"\s+", (row.text or "").lower())
            if w and re.fullmatch(r"[a-z0-9]+", w)
        ]
        expect = [t for w in words for t in greedy_word(w, vs, max_len)]
        assert seg[row.doc_id] == expect
        # vocab covers the training corpus, so no UNK and pieces
        # reconstruct the filtered text exactly
        assert "[UNK]" not in seg[row.doc_id]
        assert "".join(_strip_cont(t) for t in seg[row.doc_id]) == "".join(
            words
        )


def test_empty_and_wordless_input(spark):
    from external_benchmarks_spark.operators.wordpiece import (
        wordpiece_segment,
        wordpiece_train,
    )

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert wordpiece_train(empty).count() == 0
    docs = spark.createDataFrame(
        [(1, "!!! ???"), (2, None)], "doc_id bigint, text string"
    )
    assert wordpiece_train(docs).count() == 0
    out = {
        r["doc_id"]: list(r["wp_tokens"])
        for r in wordpiece_segment(docs, ["a"]).collect()
    }
    assert out == {1: [], 2: []}


def test_merge_application_handles_consecutive_pairs(spark):
    """The shared lazy-emit merge is symbol-level greedy: 'aaaa' under
    rule (a, ##a)->aa segments [aa, ##a, ##a] wait — positional: the
    continuation run '##a ##a ##a' under (##a, ##a)->##aa merges
    non-overlapping left-to-right."""
    from external_benchmarks_spark.operators.wordpiece import _train_local

    rows = [{"word": "aaaaa", "cnt": 3}]
    merges = _train_local(rows, 1)
    # pair counts: (a, ##a): 3, (##a, ##a): 9; symbol counts a:3 ##a:12
    # scores: 3/(3*12)=0.083 vs 9/(12*12)=0.0625 -> (a, ##a) wins
    assert merges[0][1:4] == ("a", "##a", "aa")
    assert merges[0][4] == 3
