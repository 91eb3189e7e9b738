"""Dataset production: multi-source union, derived columns, scale variants.

Mirrors the reference's pipeline (README.md:45-56): five Amazon category
datasets are combined with a provenance column, derived categorical
features are added, and uniform down-samples produce the scale variants
(README.md:13,22). The derivations below are the reference's exact
definitions (reports/summary_report.md:18-31, reports/benchmark_100k/
README.md:49-53).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def union_sources(sources: Mapping[str, DataFrame]) -> DataFrame:
    """Union per-category frames with a ``source_dataset`` provenance column
    (reference README.md:48-49). unionByName tolerates column order drift
    between sources; missing columns are an error (schema contract)."""
    out = None
    for name, df in sources.items():
        tagged = df.withColumn("source_dataset", F.lit(name))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        raise ValueError("no sources given")
    return out


def rating_tier(avg_rating: Column) -> Column:
    """excellent [4.5,5] / high [4.0,4.5) / medium [3.0,4.0) / low (<3.0)
    — reference reports/summary_report.md:26-31."""
    return (
        F.when(avg_rating >= 4.5, F.lit("excellent"))
        .when(avg_rating >= 4.0, F.lit("high"))
        .when(avg_rating >= 3.0, F.lit("medium"))
        .otherwise(F.lit("low"))
    )


def review_volume(rating_number: Column) -> Column:
    """few / moderate / many / popular — cut points chosen to reproduce the
    reference's ~48/34/13/4% split (reports/benchmark_100k/README.md:49-53)."""
    return (
        F.when(rating_number >= 10000, F.lit("popular"))
        .when(rating_number >= 1000, F.lit("many"))
        .when(rating_number >= 100, F.lit("moderate"))
        .otherwise(F.lit("few"))
    )


def add_derived_columns(df: DataFrame) -> DataFrame:
    """has_price / rating_tier / review_volume / combined_text — the four
    derived columns of the product schema (SURVEY.md §1.2 rows 5,14-16)."""
    out = df
    if "price" in df.columns:
        out = out.withColumn("has_price", F.col("price").isNotNull())
    if "average_rating" in df.columns:
        out = out.withColumn("rating_tier", rating_tier(F.col("average_rating")))
    if "rating_number" in df.columns:
        out = out.withColumn("review_volume", review_volume(F.col("rating_number")))
    text_cols = [c for c in ("title", "description", "features") if c in df.columns]
    if text_cols:
        out = out.withColumn("combined_text", F.concat_ws(" ", *text_cols))
    return out


def scale_variants(
    df: DataFrame, sizes: dict[str, float], seed: int = 42
) -> dict[str, DataFrame]:
    """Seeded uniform down-samples, one per scale variant (README.md:13,22).

    Bernoulli sampling is per-partition with no shuffle — at 100 TB each
    variant is a single map-only pass writable in the same job.
    """
    return {name: df.sample(fraction=frac, seed=seed) for name, frac in sizes.items()}
