"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the tokenizer-construction half of a training-data pipeline,
next to the encoding side (textprep.vocab_encode / bpe_token_count).

Scale shape — the classic trick that makes BPE tractable on a corpus:
merges depend only on WORD FREQUENCIES, so the corpus is touched
exactly once (tokenize -> groupBy word -> count: one shuffle, output
bounded by vocabulary size, not corpus size). Every merge iteration
then runs over that small word table: adjacent-pair counts are a
groupBy over exploded pairs weighted by word count, the winning pair
is a 1-row TakeOrderedAndProject collect, and the merge applies as a
single ``replace`` over the space-delimited symbol string (greedy
left-to-right non-overlapping — REPLACE's own semantics, identical in
Spark and any SQL engine, which is what makes the whole training run
hash-oracle-able). k merges = k tiny jobs after the one corpus pass;
at 100 TB the corpus cost is the word count, the training loop is
O(vocab) per step regardless of corpus size.

Determinism: ties on pair count break by (left symbol, right symbol)
ascending; words are restricted to ^[a-z0-9]+$ (BPE pretokenization
conventionally splits punctuation off), so symbols never collide with
the space delimiter or SQL quoting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE corpus pass: lowercase whitespace tokens filtered to
    alphanumeric words, counted. Output is vocabulary-bounded."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: (F.length(t) > 0) & t.rlike("^[a-z0-9]+$"),
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_spaced(col):
    """'hello' -> ' h e l l o ' (space-delimited symbols, sentinel
    spaces at both ends so every adjacent pair matches ' a b ')."""
    return F.concat(F.lit(" "), F.regexp_replace(col, "(.)", "$1 "))


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns a DataFrame
    (step, lhs, rhs, merged, pair_count) with step 1..n_merges in learn
    order. pair_count is the winning pair's corpus-weighted frequency
    at the time it was chosen.

    The word table is computed once and cached; each iteration is a
    pair-count groupBy over it plus a 1-row collect. Lineage grows by
    one ``replace`` per step (trivially codegen'd); for very large
    n_merges, checkpoint the word table periodically.
    """
    spark: SparkSession = docs.sparkSession
    words = word_frequencies(docs, text_col).select(
        _char_spaced(F.col("word")).alias("s"), "cnt"
    )
    base = words.cache()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            # sequence(1, size) then filter i < size: single-symbol words
            # yield no pairs (sequence(1, 0) would run DESCENDING and
            # index out of bounds under ANSI mode).
            pairs = F.expr(
                "transform(filter(sequence(1, size(split(trim(s), ' '))), "
                "i -> i < size(split(trim(s), ' '))), "
                "i -> struct(split(trim(s), ' ')[i - 1] AS a, "
                "split(trim(s), ' ')[i] AS b))"
            )
            best = (
                words.select(F.explode(pairs).alias("p"), "cnt")
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["c"] is None:
                break
            a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
            merges.append((step, a, b, a + b, c))
            words = words.select(
                F.expr(f"replace(s, ' {a} {b} ', ' {a}{b} ')").alias("s"),
                "cnt",
            )
    finally:
        base.unpersist()
    out = spark.createDataFrame(
        merges, "step bigint, lhs string, rhs string, merged string, pair_count bigint"
    )
    return out.orderBy("step")


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to segment text: per word, start from
    characters and apply each rule in learn order (the standard BPE
    inference), entirely as Catalyst replace chains over the
    space-delimited form — no UDF."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: (F.length(t) > 0) & t.rlike("^[a-z0-9]+$"),
    )
    seg = F.transform(toks, lambda w: _char_spaced(w))
    col = seg
    for a, b in merges:
        col = F.transform(
            col, lambda s: F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
        )
    out = F.flatten(
        F.transform(col, lambda s: F.split(F.trim(s), " "))
    )
    return df.withColumn(out_col, out)
