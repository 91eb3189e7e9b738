"""Distribution-drift monitoring: Population Stability Index per period.

PSI (the standard model-monitoring drift score): bucket a numeric column
into fixed bins, compare each period's bin shares p against a baseline
period's shares q, PSI = sum_bins (p - q) * ln(p / q). PSI < 0.1 is
conventionally "no shift", 0.1-0.25 "moderate", > 0.25 "major".

A 100 TB data pipeline runs this continuously over ingest periods to
catch upstream regressions (a scraper change, a source going dark)
before they poison training data. Shapes here:
- one groupBy(period, bin) over the stream — map-side partials, the
  only data-sized shuffle;
- the dense period x bin grid and the baseline join are O(periods *
  bins) rows — broadcast-trivial;
- Laplace (+1) smoothing gives every bin mass, so missing bins need no
  special casing and ln never sees 0 (same device as
  operators/quality.dsir_weights);
- the per-bin term is rounded to integer micro-units BEFORE summing
  (fixed-point; NLL_FIXED_POINT pattern) so the cross-engine result is
  integer-exact regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PSI_FIXED_POINT = 1_000_000


def psi_drift(
    df: DataFrame,
    value_col: str,
    period: Column,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 500.0,
) -> DataFrame:
    """PSI of `value_col`'s binned distribution per `period` vs the
    (lexicographically) first period.

    Returns (period, n_rows, psi_fp, psi) for every period after the
    baseline; psi_fp is the integer fixed-point sum, psi = psi_fp/1e6.
    """
    width = (hi - lo) / n_bins
    binned = df.select(
        period.alias("period"),
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - lo) / width), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).alias("bin"),
    )
    # ONE pass over the data; everything downstream is arithmetic over
    # the <= periods*bins row aggregate. localCheckpoint materializes it
    # so the grid/totals/baseline branches don't each re-scan the input
    # (the graph.py device — without it the plan re-reads the source
    # once per CTE reference).
    counts = (
        binned.groupBy("period", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    periods = counts.select("period").distinct()
    bins = F.explode(F.array(*[F.lit(i) for i in range(n_bins)])).alias("bin")
    grid = periods.select("period", bins)
    dense = grid.join(counts, ["period", "bin"], "left").select(
        "period", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    totals = dense.groupBy("period").agg(F.sum("c").alias("tot"))
    shares = dense.join(F.broadcast(totals), "period").select(
        "period",
        "bin",
        "c",
        (
            (F.col("c") + 1).cast("double")
            / (F.col("tot") + n_bins).cast("double")
        ).alias("p"),
    )
    base_period = periods.agg(F.min("period").alias("period"))
    baseline = shares.join(F.broadcast(base_period), "period").select(
        "bin", F.col("p").alias("q")
    )
    terms = (
        shares.join(F.broadcast(base_period.withColumnRenamed("period", "bp")),
                    F.col("period") != F.col("bp"))
        .join(F.broadcast(baseline), "bin")
        .select(
            "period",
            "c",
            F.round(
                (F.col("p") - F.col("q"))
                * F.log(F.col("p") / F.col("q"))
                * PSI_FIXED_POINT,
                0,
            )
            .cast("bigint")
            .alias("term_fp"),
        )
    )
    return (
        terms.groupBy("period")
        .agg(
            F.sum("c").alias("n_rows"),
            F.sum("term_fp").alias("psi_fp"),
        )
        .select(
            "period",
            "n_rows",
            "psi_fp",
            F.round(F.col("psi_fp") / PSI_FIXED_POINT, 6).alias("psi"),
        )
        .orderBy("period")
    )
