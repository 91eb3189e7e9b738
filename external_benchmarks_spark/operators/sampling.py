"""Sampling & dataset-variant production.

The reference produces 10k/100k/1M variants from 10M "via uniform
sampling" (README.md:13,22). Two forms:

- ``uniform_sample``       : seeded Bernoulli df.sample — the production
                             path (per-partition, no shuffle).
- ``deterministic_sample`` : key-modulus filter — engine-independent, used
                             wherever output must hash-match an oracle
                             (engine RNGs never agree; SURVEY.md §5.3/O17).
- ``stratified_sample_mod``: per-stratum modulus sample (distribution-
                             preserving, the property the reference
                             validates across scales,
                             reports/summary_report.md:42-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def deterministic_sample(df: DataFrame, key_col: str, modulus: int, keep: int) -> DataFrame:
    """Keep rows where key % modulus < keep — identical in any engine."""
    return df.filter((F.col(key_col) % modulus) < keep)


def stratified_sample_mod(
    df: DataFrame, stratum_col: str, key_col: str, modulus: int, keep: int
) -> DataFrame:
    """Deterministic per-stratum sample + per-stratum counts (validation)."""
    sampled = deterministic_sample(df, key_col, modulus, keep)
    return (
        sampled.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("sampled_cnt"))
    )


def stratified_fixed_n(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum, chosen by hash order — deterministic
    (no engine RNG), reproducible across cluster sizes, and unbiased
    within each stratum because the md5 ordering is independent of any
    data column. One shuffle (window by stratum); at 100 TB prefer
    pre-aggregating candidates per partition when n is tiny relative to
    stratum size (rank <= n survives partial top-k pushdown via AQE).
    """
    from pyspark.sql.window import Window

    from external_benchmarks_spark.functions.hashing import md5_hash32

    h = md5_hash32(F.concat(F.lit("sfn:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    rates: dict[str, float],
    precision: int = 10_000,
) -> DataFrame:
    """Domain-mixture sampling: keep each source at its own deterministic
    rate — the knob every LLM pre-training corpus turns (upweight curated
    sources, downsample crawl). Inclusion is a stable md5 test of the key
    (md5_hash32(key) % precision < rate * precision): reproducible across
    engines and cluster sizes, no RNG, and filter-pushdown friendly.
    Sources absent from ``rates`` are dropped (rate 0)."""
    from external_benchmarks_spark.functions.hashing import md5_hash32

    h = md5_hash32(F.concat(F.lit("mix:"), F.col(key_col).cast("string"))) % precision
    thresh = None
    for src, rate in sorted(rates.items()):
        cond = F.col(source_col) == src
        val = F.lit(int(rate * precision))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return df.filter(h < thresh)


def cluster_sample(
    assigned: DataFrame,
    rates: dict[int, float],
    key_col: str = "vec_id",
    cluster_col: str = "centroid_id",
    precision: int = 10_000,
) -> DataFrame:
    """Per-cluster deterministic sampling — the quota step of
    cluster-then-sample curation (downsample bloated clusters, keep rare
    ones whole, as SemDeDup/SSL-prototype pipelines do after profiling).
    Same stable md5 inclusion test as mixture_sample (engine- and
    cluster-size-independent, pushdown-friendly); clusters absent from
    ``rates`` are dropped."""
    from external_benchmarks_spark.functions.hashing import md5_hash32

    h = md5_hash32(F.concat(F.lit("cs:"), F.col(key_col).cast("string"))) % precision
    thresh = None
    for cid, rate in sorted(rates.items()):
        cond = F.col(cluster_col).cast("bigint") == int(cid)
        val = F.lit(int(rate * precision))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    thresh = thresh.otherwise(F.lit(0)) if thresh is not None else F.lit(0)
    return assigned.filter(h < thresh)
