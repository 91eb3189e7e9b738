"""Curation funnel — the composed training-data cleaning pass: exact
dedup + length gate + quality gate in ONE dataflow, with per-reason drop
accounting (the numbers a dataset card reports).

One pass over the corpus: the dedup keeper test is a window-min over the
content hash (shuffle key = 16-byte digest), every other gate is a
per-row expression. No joins, no second scan — at 100 TB this runs at
I/O speed, and the funnel counts shrink to one row per reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from external_benchmarks_spark.functions.text import quality_score, token_count

REASONS = ("duplicate", "too_short", "low_quality", "kept")


def curation_flags(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
) -> DataFrame:
    """Adds ``reason``: first failing gate, else 'kept'. Gate order is
    duplicate -> too_short -> low_quality (the conventional funnel order:
    dedup first so quality stats describe unique docs)."""
    w = Window.partitionBy(F.md5(F.col(content_col)))
    is_dup = F.col(key_col) > F.min(key_col).over(w)
    n_tokens = token_count(F.col(content_col))
    reason: Column = (
        F.when(is_dup, F.lit("duplicate"))
        .when(n_tokens < min_tokens, F.lit("too_short"))
        .when(quality_score(F.col(content_col)) < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return df.withColumn("reason", reason)


def curation_funnel(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-reason drop counts — the dataset-card funnel table."""
    return (
        curation_flags(df, key_col, content_col, min_tokens, min_quality)
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def curated(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
) -> DataFrame:
    """The surviving corpus (reason == 'kept'), original columns only."""
    return (
        curation_flags(df, key_col, content_col, min_tokens, min_quality)
        .filter(F.col("reason") == "kept")
        .drop("reason")
    )


def curated_with_metrics(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.5,
):
    """Curated corpus + an Observation carrying the funnel counts.

    ``df.observe`` piggybacks the accounting on whatever action consumes
    the curated frame (usually the write) — ONE pass produces both the
    clean dataset and its dataset-card numbers, where a separate
    curation_funnel() call would re-scan the corpus. Returns
    (curated_df, observation); read observation.get after an action runs.
    """
    from pyspark.sql import Observation

    flagged = curation_flags(df, key_col, content_col, min_tokens, min_quality)
    obs = Observation("curation_funnel")
    observed = flagged.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum((F.col("reason") == r).cast("long")).alias(r)
            for r in REASONS
        ],
    )
    return observed.filter(F.col("reason") == "kept").drop("reason"), obs
