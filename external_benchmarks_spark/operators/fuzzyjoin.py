"""Complete edit-distance-1 similarity join via deletion-variant
blocking (the SymSpell / symmetric-delete principle, Garbe 2012) —
the EXACT-complete sibling of the blocked Levenshtein linkage
(operators/linkage.py, which misses cross-block pairs by design) for
the vocabulary-normalization question every text pipeline hits: which
term pairs are one typo apart (duplicate variants to fold, OCR noise,
tokenizer-vocab cleanup).

Principle: if ed(a, b) <= 1 then the deletion neighborhoods
D(x) = {x} ∪ {x with one char deleted} intersect —
  substitution: delete the differing position from both sides;
  insertion/deletion: the shorter string IS a deletion variant of the
  longer; equality: x itself. So an equi-join on variants is a
  COMPLETE candidate generator (no LSH-style misses, no metadata
  block), and sharing a variant only bounds ed <= 2 ("ab"/"ba" both
  delete to "a" and "b" but ed = 2), so candidates verify through the
  exact Levenshtein — identical classic DP (no transpositions) in
  Spark and DuckDB, integer result.

100 TB shape: |D(x)| = len(x) + 1, so the variant table is
O(corpus tokens x avg word length) rows of short strings; the join
buckets by variant (posting list = terms within one deletion of that
variant — small for natural vocabularies); verification touches only
candidates. All equi-joins; zero cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DELETION_VARIANTS_SQL = (
    "array_distinct(concat(array({c}), "
    "transform(sequence(1, length({c})), i -> "
    "concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c}))))))"
)


def fuzzy_term_pairs(
    terms: DataFrame, term_col: str = "term", tau: int = 1
) -> DataFrame:
    """All unordered term pairs (term_a < term_b) with Levenshtein
    distance <= tau (tau = 1 is the complete-by-construction regime;
    the deletion join still generates, but does not guarantee, tau = 2
    candidates). Output: (term_a, term_b, dist)."""
    if tau != 1:
        raise ValueError("symmetric-delete completeness holds for tau=1")
    t = (
        terms.select(F.col(term_col).alias("_t"))
        .filter(F.col("_t").isNotNull() & (F.length("_t") > 0))
        .distinct()
    )
    variants = t.select(
        "_t",
        F.explode(F.expr(DELETION_VARIANTS_SQL.format(c="_t"))).alias("_v"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, "_v")
        .filter(F.col("a._t") < F.col("b._t"))
        .select(F.col("a._t").alias("term_a"), F.col("b._t").alias("term_b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("term_a", "term_b"))
        .filter(F.col("dist") <= tau)
        .select("term_a", "term_b", F.col("dist").cast("bigint").alias("dist"))
    )
