"""Fuzzy record linkage: blocked edit-distance matching.

The missing tier between exact dedup (operators/dedup.exact_dedup) and
semantic near-dup (embedding_neardup_pairs): catch typo-level variants
of structured names/titles. Classic blocked linkage — a cheap blocking
key bounds the candidate join, a free length-difference lower bound
prunes before the O(len^2) Levenshtein, and only surviving pairs pay
the distance computation.

Scale shape: the self-join is keyed on the block (never all-pairs);
`abs(len(a) - len(b)) <= max_dist` is a true lower bound on edit
distance, so it is a lossless pushdown predicate that runs in codegen
before the expensive expression. At 100 TB the first-token block key
swaps for q-gram MinHash bands (operators/dedup.minhash_lsh_pairs) —
the join topology is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(name: Column) -> Column:
    """Default blocking key for multi-word names: the first token."""
    return F.split(name, " ").getItem(0)


def fuzzy_blocked_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_fn=first_token_block,
) -> DataFrame:
    """Distinct-name pairs (name_a < name_b) within a block at
    Levenshtein distance in [1, max_dist].

    Input rows may repeat names; matching runs on the distinct name set
    (linkage is a property of the vocabulary, not row multiplicity).
    """
    names = (
        df.select(F.col(name_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .select("name", block_fn(F.col("name")).alias("blk"))
    )
    a = names.select(
        F.col("name").alias("name_a"), F.col("blk").alias("blk")
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("blk").alias("blk")
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "blk")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
            )
        )
        .select(
            "name_a",
            "name_b",
            lev.cast("bigint").alias("dist"),
        )
        .where((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .orderBy("name_a", "name_b")
    )
