"""Corpus n-gram language-model scoring (CCNet-style quality signal).

The CCNet / RedPajama curation recipe scores every document with a small
n-gram language model and buckets the corpus by perplexity; documents the
LM finds "surprising" are disproportionately boilerplate, gibberish, or
the wrong language. The reference pipeline stops at heuristic quality
ratios (reference scripts/generate_benchmark_reports.py:200-246 derive
length/marker stats only); this operator adds the LM tier a 100 TB
pretraining pipeline runs next.

Model: word-bigram LM with Laplace (add-one) smoothing, trained on the
corpus being scored.

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

where c(w1 w2) is the corpus bigram count, c(w1) the count of bigram
occurrences whose context token is w1 (so sum_w2 c(w1 w2) == c(w1)
exactly), and V the corpus vocabulary size. Per document we emit the
number of bigram tokens and the average negative log-likelihood
(cross-entropy, nats/bigram) — the monotone equivalent of perplexity
without an exp() at the end.

Determinism contract (oracle hash-match): every per-bigram probability is
an IEEE division of two exactly-representable integers, so Spark and
DuckDB compute bit-identical doubles; ln() of the same double may differ
by an ulp between libm builds, so each -ln term is rounded to 1e-6
fixed-point and summed as an INTEGER (order-independent, exact). The
final average is again a division of two exact integers. No float sums
ever cross a shuffle.

Scale shape (100 TB): one explode (row expansion x avg doc length), two
groupBys keyed by bigram / context token (Zipf-skewed keys, but partial
aggregation absorbs the hot heads before the shuffle), two many-to-one
joins back to the occurrence stream (hot-key skew handled by AQE skew
join; the count side is one row per key), one final groupBy(doc_id)
summing integers. Vocabulary size V is the only driver-side scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.functions.text import tokens
from external_benchmarks_spark.operators.textprep import _ngrams

NLL_FIXED_POINT = 1_000_000


def bigram_occurrences(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One row per bigram occurrence: (doc_id, bg). Null / short texts
    yield no rows (callers re-attach absent docs with a left join)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_ngrams(tokens(text_col), 2)).alias("bg"),
    )


def lm_score(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document bigram cross-entropy under the corpus LM.

    Returns (doc_id, n_bigrams, nll_fp_sum, avg_xent): the fixed-point
    integer NLL sum is the hash-stable payload; avg_xent is the derived
    nats-per-bigram average (0.0 for docs with no bigrams).
    """
    occ = bigram_occurrences(docs, text_col, id_col)
    bg_counts = occ.groupBy("bg").agg(F.count("*").alias("c_bg"))
    ctx_counts = (
        occ.select(F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c_ctx"))
    )
    # V: one scalar to the driver (a COUNT, not data).
    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )

    prob = (F.col("c_bg") + F.lit(1)).cast("double") / (
        F.col("c_ctx") + F.lit(int(vocab))
    ).cast("double")
    scored = (
        occ.join(bg_counts, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ctx_counts, "w1")
        .withColumn(
            "nll_fp",
            F.round(-F.log(prob) * NLL_FIXED_POINT, 0).cast("long"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("nll_fp").alias("nll_fp_sum")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_fp_sum", F.lit(0)).cast("long").alias("nll_fp_sum"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("nll_fp_sum").cast("double")
                / (F.col("n_bigrams") * NLL_FIXED_POINT).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_xent"),
        )
    )
