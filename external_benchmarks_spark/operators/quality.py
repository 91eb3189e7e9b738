"""Corpus-quality operators beyond per-document heuristics: rule-based
filtering (Gopher) and distribution-matching importance weights (DSIR).

Both are standard stages of a 100 TB pretraining-data pipeline that the
reference's report stats (reference scripts/generate_benchmark_reports.py:
200-246, length/marker ratios only) stop short of:

- ``gopher_rules``: the repetition-independent subset of the Gopher
  quality rules (Rae et al. 2021, "Scaling Language Models", Appendix A):
  word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  alphabetic-word fraction, required-stopword hits. Pure Catalyst
  expressions — a single codegen'd projection, no shuffle at any scale.
  (Repetition-based Gopher rules live in textprep.repetition_stats.)

- ``dsir_weights``: hashed-bigram importance weights (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"): score
  every raw document by how much its hashed-n-gram profile looks like a
  target subcorpus, log p_target(x) - log p_raw(x) under bag-of-hashed-
  bigrams models with Laplace smoothing. The weight feeds weighted
  sampling (operators/sampling.weighted_sample) to resample raw data
  toward the target distribution.

Determinism contract (oracle hash-match, SURVEY.md §5.3): every ratio is
one IEEE division of exactly-representable integers; each per-bucket
log-ratio is a single ln() of such a division, rounded to 1e-6
fixed-point and summed per document as an INTEGER — order-independent
across partitions, bit-identical in DuckDB. At real corpus scale the
integer products in the ln argument may exceed 2^53 and round (harmless
for selection quality); at oracle scale they are exact.

Scale shape of ``dsir_weights``: one explode (x avg doc length), one
groupBy on n_buckets keys (bounded fan-in: at most n_buckets groups
survive the map-side partial agg), a broadcast join of the n_buckets-row
log-ratio table back to the occurrence stream, one integer-sum
groupBy(doc_id). The only non-broadcast shuffles are keyed by bucket id
(uniform by construction — md5) and doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.functions.hashing import md5_hash32
from external_benchmarks_spark.functions.text import tokens
from external_benchmarks_spark.operators.lm import NLL_FIXED_POINT

# Gopher Appendix A: documents must contain at least 2 of these words.
REQUIRED_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

# Gopher thresholds (Rae et al. 2021 Appendix A, Table A1).
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.80
MIN_STOPWORD_HITS = 2


def gopher_rules(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher rule metrics and the combined keep decision.

    Returns (doc_id, n_words, mean_word_len, symbol_ratio,
    alpha_word_frac, stop_hits, keep). All metrics are emitted (not just
    the boolean) so a pipeline can audit WHY a document was dropped —
    the operational requirement that makes rule filters debuggable at
    scale.

    Symbol counts use length-difference against replace() rather than a
    regex so the same non-overlapping semantics hold verbatim in the
    DuckDB oracle.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(text)
    n_words = F.size(toks).cast("long")
    wl_sum = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.when(
        n_words > 0, wl_sum.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = (
        (F.length(text) - F.length(F.regexp_replace(text, "\\.\\.\\.", "")))
        / F.lit(3)
    ).cast("bigint")
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_ellipsis).cast("double") / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    alpha_frac = F.when(
        n_words > 0, alpha_words.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]),
            lambda w: F.array_contains(toks, w),
        )
    ).cast("long")
    keep = (
        n_words.between(MIN_WORDS, MAX_WORDS)
        & mean_wl.between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (symbol_ratio < MAX_SYMBOL_RATIO)
        & (alpha_frac > MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= MIN_STOPWORD_HITS)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Hashed-bigram importance weight of every document toward the
    subcorpus selected by ``is_target`` (a boolean Column over ``docs``).

    Per bucket b (bigram md5-hashed mod n_buckets), with t_b / r_b the
    target / raw occurrence counts and T / R their totals:

        lr(b) = ln( ((t_b + 1) * (R + n_buckets))
                  / ((r_b + 1) * (T + n_buckets)) )

    i.e. log p_target(b) - log p_raw(b) under Laplace smoothing, folded
    into ONE ln of one exact division so both engines make a single libm
    call on an identical double. Per document:

        weight_fp = sum over bigram occurrences of round(lr * 1e6)
        avg_logratio = weight_fp / (n_bigrams * 1e6)

    Positive avg_logratio: the document looks more like the target than
    the raw corpus. Returns (doc_id, n_bigrams, weight_fp, avg_logratio);
    documents with < 2 tokens get (0, 0, 0.0) via the final left join.
    """
    from external_benchmarks_spark.operators.textprep import _ngrams

    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("is_tgt"),
        F.explode(_ngrams(tokens(text_col), 2)).alias("bg"),
    ).select(
        "doc_id", "is_tgt", F.pmod(md5_hash32("bg"), F.lit(n_buckets)).alias("b")
    )
    buckets = occ.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = buckets.agg(
        F.sum("c_raw").alias("tot_raw"), F.sum("c_tgt").alias("tot_tgt")
    )
    # n_buckets rows x 1 row: a broadcast-trivial cross join, then the
    # log-ratio table itself broadcasts onto the occurrence stream.
    lr = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log(
                ((F.col("c_tgt") + 1) * (F.col("tot_raw") + n_buckets)).cast(
                    "double"
                )
                / ((F.col("c_raw") + 1) * (F.col("tot_tgt") + n_buckets)).cast(
                    "double"
                )
            )
            * NLL_FIXED_POINT,
            0,
        )
        .cast("bigint")
        .alias("lr_fp"),
    )
    per = (
        occ.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lr_fp").alias("weight_fp"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("weight_fp", F.lit(0)).cast("long").alias("weight_fp"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("weight_fp").cast("double")
                / (F.col("n_bigrams") * NLL_FIXED_POINT).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_logratio"),
        )
    )
