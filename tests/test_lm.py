"""Unit semantics for the corpus bigram-LM scorer (operators/lm.py):
hand-computed probabilities on a 3-doc corpus, totality on empty/short
texts, and the fixed-point determinism contract."""

from __future__ import annotations

import math

from external_benchmarks_spark.operators.lm import NLL_FIXED_POINT, lm_score


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_score_hand_computed(spark):
    # Corpus: "a b a b", "a b", "c". Bigrams: (a b)x2, (b a)x1 from doc0;
    # (a b)x1 from doc1; none from doc2. c(a b)=3, c(b a)=1; contexts
    # c(a)=3, c(b)=1; vocab V=3 (a, b, c).
    docs = _mk_docs(
        spark, [(0, "a b a b"), (1, "a b"), (2, "c")]
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}

    p_ab = (3 + 1) / (3 + 3)  # Laplace: (c_bg+1)/(c_ctx+V)
    p_ba = (1 + 1) / (1 + 3)
    fp = lambda p: round(-math.log(p) * NLL_FIXED_POINT)

    assert out[0]["n_bigrams"] == 3
    assert out[0]["nll_fp_sum"] == 2 * fp(p_ab) + fp(p_ba)
    assert out[0]["avg_xent"] == out[0]["nll_fp_sum"] / (3 * NLL_FIXED_POINT)

    assert out[1]["n_bigrams"] == 1
    assert out[1]["nll_fp_sum"] == fp(p_ab)

    # Single-token doc: no bigrams, zeroed but present.
    assert out[2]["n_bigrams"] == 0
    assert out[2]["nll_fp_sum"] == 0
    assert out[2]["avg_xent"] == 0.0


def test_lm_score_null_and_empty_text(spark):
    docs = _mk_docs(spark, [(0, None), (1, ""), (2, "x y")])
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["n_bigrams"] == 0 and out[1]["n_bigrams"] == 0
    assert out[2]["n_bigrams"] == 1


def test_lm_score_rarer_sequences_score_higher(spark):
    # A doc full of the corpus's dominant bigram must score lower
    # cross-entropy than a doc of one-off bigrams.
    rows = [(i, "the cat sat") for i in range(10)]
    rows.append((100, "zq vw kj"))
    out = {r["doc_id"]: r for r in lm_score(_mk_docs(spark, rows)).collect()}
    assert out[0]["avg_xent"] < out[100]["avg_xent"]
