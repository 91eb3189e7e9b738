"""Dataset production: multi-source union, derived columns, scale variants.

Mirrors the reference's pipeline (README.md:45-56): five Amazon category
datasets are combined with a provenance column, derived categorical
features are added, and uniform down-samples produce the scale variants
(README.md:13,22). The derivations below are the reference's exact
definitions (reports/summary_report.md:18-31, reports/benchmark_100k/
README.md:49-53).
"""

from __future__ import annotations

import math
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


def prune_details(df: DataFrame, details_col: str = "details") -> DataFrame:
    """Strip redundant null entries from the `details` JSON blob.

    The reference notes `details` carries "redundant nulls, 20-30%
    prunable" but never parses it (reference README.md:17); this is that
    pruning as a first-class op: from_json -> map_filter -> to_json, all
    Catalyst (codegen, no shuffle, no Python). Adds
    `<col>_pruned` plus before/after byte counts so the saving is
    measurable per row.
    """
    from pyspark.sql.types import MapType, StringType

    parsed = F.from_json(F.col(details_col), MapType(StringType(), StringType()))
    kept = F.map_filter(
        parsed, lambda k, v: v.isNotNull() & (v != "null") & (v != "")
    )
    pruned = F.to_json(kept)
    return (
        df.withColumn(f"{details_col}_pruned", pruned)
        .withColumn("details_bytes", F.length(F.col(details_col)).cast("long"))
        .withColumn("pruned_bytes", F.length(pruned).cast("long"))
    )


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


# SQL twins of rating_tier / review_volume (a CASE WHEN chain is the
# same Catalyst expression as the F.when chain), kept adjacent so the
# cut points stay in lockstep.
RATING_TIER_SQL = (
    "CASE WHEN {c} >= 4.5 THEN 'excellent' WHEN {c} >= 4.0 THEN 'high'"
    " WHEN {c} >= 3.0 THEN 'medium' ELSE 'low' END"
)
REVIEW_VOLUME_SQL = (
    "CASE WHEN {c} >= 10000 THEN 'popular' WHEN {c} >= 1000 THEN 'many'"
    " WHEN {c} >= 100 THEN 'moderate' ELSE 'few' END"
)


def add_derived_columns(df: DataFrame) -> DataFrame:
    """has_price / rating_tier / review_volume / combined_text — the four
    derived columns of the product schema (SURVEY.md §1.2 rows 5,14-16).

    One selectExpr call (same append order as the previous per-column
    withColumn chain) so the whole projection is one py4j round-trip
    instead of ~60 (guide §4; measured 0.28 s/call of socket wait)."""
    exprs = ["*"]
    if "price" in df.columns:
        exprs.append("`price` IS NOT NULL AS has_price")
    if "average_rating" in df.columns:
        exprs.append(
            RATING_TIER_SQL.format(c="`average_rating`") + " AS rating_tier"
        )
    if "rating_number" in df.columns:
        exprs.append(
            REVIEW_VOLUME_SQL.format(c="`rating_number`")
            + " AS review_volume"
        )
    text_cols = [c for c in ("title", "description", "features") if c in df.columns]
    if text_cols:
        cols = ", ".join(f"`{c}`" for c in text_cols)
        exprs.append(f"concat_ws(' ', {cols}) AS combined_text")
    return df.selectExpr(*exprs) if len(exprs) > 1 else df


_VOCAB = [
    "alpha", "bolt", "cable", "drive", "ember", "frame", "grid", "hinge",
    "input", "joint", "kernel", "lever", "motor", "node", "optic", "panel",
    "quartz", "rotor", "socket", "tuner", "unit", "valve", "wheel", "xenon",
    "yield", "zoom", "amber", "blade", "cover", "diode", "edge", "fiber",
    "gauge", "handle", "iron", "jack", "kit", "lens", "mount", "nozzle",
    "oring", "plug", "quill", "rail", "spring", "tube", "vent", "wire",
    "axle", "beam",
]

_CATEGORY_WEIGHTS = [
    ("Books", 410), ("Automotive", 150), ("Tools & Home Improvement", 130),
    ("All Beauty", 80), ("Computers", 30), ("Buy a Kindle", 30),
    ("Garden", 25), ("Toys", 25), ("Music", 20), ("Office", 20),
    ("Pet Supplies", 20), ("Grocery", 15), ("Sports", 15), ("Baby", 10),
    ("Software", 10), ("Appliances", 3),  # remainder -> null (0.7%)
]

_SOURCES = [
    "Books", "Automotive", "Tools_and_Home_Improvement", "Electronics",
    "Beauty_and_Personal_Care",
]


def _h(seed: int, tag: int) -> Column:
    """Deterministic per-row uniform in [0, 1000) from (id, seed, tag)."""
    return F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag)), F.lit(1000))


def _words(seed: int, tag: int, min_n: int, max_n: int) -> Column:
    n = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag)), F.lit(max_n - min_n + 1)) + min_n).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.element_at(
                vocab,
                (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag), i), F.lit(len(_VOCAB))) + 1).cast("int"),
            ),
        ),
    )


def make_products_fixture(spark, n: int = 10_000, seed: int = 42) -> DataFrame:
    """The FIXTURES.md `products` table: a deterministic, fully
    Spark-side generator of the reference's 17-column data model
    (schemas.PRODUCT_SCHEMA), with the reference's null rates and the
    skewed category mix (Books ~41%). No driver-side loops — scales to
    any n. (The per-half embedding-norm constraint in FIXTURES.md is
    relaxed to small integers: exactness matters more than geometry for
    the oracle tests that consume this.)
    """
    df = spark.range(n).select(F.col("id"))

    acc = 0
    r = _h(seed, 1)
    thresholds = []
    for name, w in _CATEGORY_WEIGHTS:
        thresholds.append((acc + w, name))
        acc += w
    cat_expr = F.lit(None).cast("string")
    for bound, name in reversed(thresholds):
        cat_expr = F.when(r < bound, F.lit(name)).otherwise(cat_expr)

    u_rating = _h(seed, 2) / 1000.0
    u_rn = _h(seed, 3) / 1000.0
    u_price = _h(seed, 4) / 1000.0

    out = df.select(
        "id",
        F.concat(F.lit("P"), F.lpad((F.col("id") % 9000).cast("string"), 5, "0")).alias("parent_asin"),
        _words(seed, 10, 2, 12).alias("title"),
        F.when(_h(seed, 11) < 50, F.lit("")).otherwise(_words(seed, 12, 1, 60)).alias("description"),
        F.when(_h(seed, 13) < 100, F.lit("")).otherwise(_words(seed, 14, 1, 40)).alias("features"),
        # skewed-high ratings, one decimal, median ~4.4 (5 - 2.5u^2)
        F.round(F.greatest(F.lit(1.0), 5.0 - 2.5 * u_rating * u_rating), 1).alias("average_rating"),
        # log-uniform 1..300k heavy tail
        (F.floor(F.exp(u_rn * math.log(300_000))) + 1).cast("long").alias("rating_number"),
        F.when(_h(seed, 5) < 420, F.lit(None).cast("double"))
         .otherwise(F.round(0.01 + u_price * 6999.99, 2)).alias("price"),
        cat_expr.alias("main_category"),
        F.concat_ws(" > ", _words(seed, 15, 1, 3)).alias("categories"),
        F.when(_h(seed, 6) < 26, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("store_"), _h(seed, 7).cast("string"))).alias("store"),
        F.concat(
            F.lit('{"brand": "'), F.element_at(F.array(*[F.lit(w) for w in _VOCAB[:12]]), (_h(seed, 8) % 12 + 1).cast("int")),
            F.lit('", "weight": '),
            F.when(_h(seed, 9) < 300, F.lit('"null"')).otherwise((_h(seed, 9) % 50).cast("string")),
            F.lit("}"),
        ).alias("details"),
        F.element_at(F.array(*[F.lit(s) for s in _SOURCES]), (_h(seed, 16) % len(_SOURCES) + 1).cast("int")).alias("source_dataset"),
        F.transform(F.sequence(F.lit(0), F.lit(7)),
                    lambda i: (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(20), i), F.lit(7)) - 3).cast("float")).alias("embedding"),
    )
    return add_derived_columns(out).drop("id").select(
        "parent_asin", "title", "description", "features", "combined_text",
        "average_rating", "rating_number", "price", "main_category",
        "categories", "store", "details", "source_dataset", "has_price",
        "rating_tier", "review_volume", "embedding",
    )


def scale_variants(
    df: DataFrame, sizes: dict[str, float], seed: int = 42
) -> dict[str, DataFrame]:
    """Seeded uniform down-samples, one per scale variant (README.md:13,22).

    Bernoulli sampling is per-partition with no shuffle — at 100 TB each
    variant is a single map-only pass writable in the same job.
    """
    return {name: df.sample(fraction=frac, seed=seed) for name, frac in sizes.items()}
