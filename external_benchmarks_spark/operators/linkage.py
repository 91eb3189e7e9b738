"""Fuzzy record linkage: blocked edit-distance matching.

The missing tier between exact dedup (operators/dedup.exact_dedup) and
semantic near-dup (embedding_neardup_pairs): catch typo-level variants
of structured names/titles. Classic blocked linkage — a cheap blocking
key bounds the candidate join, a free length-difference lower bound
prunes before the O(len^2) Levenshtein, and only surviving pairs pay
the distance computation.

Scale shape: the self-join is keyed on the block (never all-pairs), and
``max_block_rows`` bounds the fan-out of degenerate giant blocks (the
"The ..."/brand-prefix skew real name vocabularies have) with the same
two-level device ``operators/dedup._subblock_key`` uses for embedding
blocks:

1. **Length band** (LOSSLESS): an oversized block is split by
   ``floor(len(name) / w)`` with ``w = max(max_dist, 1)``. Edit distance
   ``<= max_dist`` bounds the length difference by ``max_dist``, so a
   qualifying pair sits in the same or adjacent bands — the right side
   is replicated into bands ``{b-1, b, b+1}`` (each pair matches on
   exactly ONE of the three, so nothing is double-counted) and no
   qualifying pair is ever lost.
2. **Hash-salt fallback** (hard bound, drop-only): a (block, band)
   still over the cap — the adversarial case of thousands of
   same-length names sharing a first token, which no length split can
   separate — is salted by ``xxhash64(name) % ceil(n/cap)``, giving
   expected sub-block size ~cap regardless of the vocabulary's
   geometry. Cross-salt pairs are dropped — the documented price of a
   hard fan-out bound, the same trade MinHash-LSH banding makes.

Blocks at or under the cap are untouched (exact), so small-vocabulary
workloads (the registry's part-name query) are bit-identical with or
without the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(name: Column) -> Column:
    """Default blocking key for multi-word names: the first token."""
    return F.split(name, " ").getItem(0)


def _blocked_candidates(
    names: DataFrame,
    max_dist: int,
    max_block_rows: int | None,
) -> DataFrame:
    """Candidate (name_a < name_b) pairs before the Levenshtein filter.

    ``names`` is the distinct (name, blk) vocabulary. Split out so the
    fan-out bound is testable independently of the distance predicate.
    """
    length_bound = (
        F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
    )
    if max_block_rows is None:
        a = names.select(F.col("name").alias("name_a"), "blk")
        b = names.select(F.col("name").alias("name_b"), "blk")
        return a.join(b, "blk").where(
            (F.col("name_a") < F.col("name_b")) & length_bound
        )

    w = max(max_dist, 1)
    sizes = names.groupBy("blk").agg(F.count(F.lit(1)).alias("_blk_n"))
    banded = (
        names.join(sizes, "blk")
        .withColumn("_big", F.col("_blk_n") > max_block_rows)
        .withColumn(
            "_band",
            F.when(
                F.col("_big"), F.floor(F.length("name") / w).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .drop("_blk_n")
    )
    # Level-2 salt width per (blk, band): 1 (no-op) until a band itself
    # exceeds the cap. Both join sides look the width up for the BAND
    # BEING JOINED, so a right-side replica in band b' salts with band
    # b''s width — the two sides always agree on the modulus.
    widths = banded.groupBy("blk", "_band").agg(
        F.ceil(F.count(F.lit(1)) / max_block_rows).cast("bigint").alias("_n_salt")
    )

    def salted(side: DataFrame, col_alias: str) -> DataFrame:
        return side.join(widths, ["blk", "_band"]).select(
            F.col("name").alias(col_alias),
            "blk",
            "_band",
            F.pmod(F.xxhash64(F.col("name")), F.col("_n_salt")).alias("_salt"),
        )

    a = salted(banded, "name_a")
    # Right side: small blocks keep their single row; oversized blocks
    # fan out to the adjacent bands (distinct band per replica => each
    # qualifying pair matches exactly once).
    b_rep = banded.withColumn(
        "_band",
        F.explode(
            F.when(
                F.col("_big"),
                F.array(
                    F.col("_band") - 1, F.col("_band"), F.col("_band") + 1
                ),
            ).otherwise(F.array(F.col("_band")))
        ),
    )
    b = salted(b_rep, "name_b")
    return (
        a.join(b, ["blk", "_band", "_salt"])
        .where((F.col("name_a") < F.col("name_b")) & length_bound)
        .drop("_band", "_salt")
    )


def fuzzy_blocked_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_fn=first_token_block,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Distinct-name pairs (name_a < name_b) within a block at
    Levenshtein distance in [1, max_dist].

    Input rows may repeat names; matching runs on the distinct name set
    (linkage is a property of the vocabulary, not row multiplicity).
    ``max_block_rows`` bounds candidate fan-out for skewed block keys
    (module docstring): exact at or under the cap, drop-only above it.
    """
    names = (
        df.select(F.col(name_col).alias("name"))
        .where(F.col("name").isNotNull())
        .distinct()
        .select("name", block_fn(F.col("name")).alias("blk"))
    )
    cand = _blocked_candidates(names, max_dist, max_block_rows)
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        cand.select("name_a", "name_b", lev.cast("bigint").alias("dist"))
        .where((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .orderBy("name_a", "name_b")
    )
