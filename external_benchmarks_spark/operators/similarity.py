"""Similarity search over embedding columns.

Two tiers (SURVEY.md §7.5 — Spark has no native ANN):

- ``bruteforce_topk``   : exact cosine/dot top-k. The correctness oracle
                          (reference README.md:76 measures recall against
                          exact search) and perfectly scalable: score is a
                          map-only pass, top-k is TakeOrderedAndProject.
- ``lsh_bucketed_topk`` : random-hyperplane LSH pre-filter — score only
                          rows whose sign-bucket matches the query's in
                          >= ``min_matching_bits`` of ``n_planes`` bits.
                          The scale path: at 100 TB the bucket id is a
                          partition column, so a query touches only its
                          bucket's partitions. Recall is measured against
                          bruteforce via operators.topk.recall_at_k.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.functions.vector import (
    cosine_similarity_literal,
    dot_product_literal,
)


def bruteforce_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k by cosine (or dot) against a fixed query vector."""
    score = (
        cosine_similarity_literal(emb_col, qvec)
        if metric == "cosine"
        else dot_product_literal(emb_col, qvec)
    )
    return (
        df.select(F.col(key_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket_col(emb_col: str, planes: np.ndarray):
    """Sign-bit bucket id of an embedding column: bit i = dot(emb, plane_i) > 0.

    Pure Catalyst arithmetic — usable as a partition column at write time
    (pipeline/index.py) so queries prune partitions.
    """
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        d = dot_product_literal(emb_col, [float(x) for x in plane])
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("bigint")
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    min_matching_bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """ANN: score only rows whose LSH bucket is Hamming-close to the query's.

    With ``min_matching_bits == n_planes`` this scans one bucket (fastest,
    lowest recall); lowering it widens the probe (multi-probe LSH).
    """
    planes = hyperplanes(len(qvec), n_planes, seed)
    qbits = [bool(np.dot(plane, qvec) > 0) for plane in planes]

    bucket = lsh_bucket_col(emb_col, planes)
    qbucket = sum((1 << i) for i, b in enumerate(qbits) if b)
    # popcount(bucket XOR qbucket) <= n_planes - min_matching_bits
    x = bucket.bitwiseXOR(F.lit(qbucket).cast("bigint"))
    pop = sum(
        (F.shiftright(x, i) % 2).cast("int") for i in range(n_planes)
    )
    cand = df.filter(pop <= (n_planes - min_matching_bits))
    return bruteforce_topk(cand, qvec, k, key_col, emb_col, metric="cosine")


def pairwise_cosine_stats(
    df: DataFrame,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_n: int = 200,
) -> DataFrame:
    """Distribution of pairwise cosine sims on a bounded sample.

    Reference scripts/generate_benchmark_reports.py:527-539 computes an
    n<=200 pairwise cosine matrix and keeps the upper triangle; here the
    sample is taken distributed, the pair join is a broadcast self-join,
    and only moments come back.
    """
    sample = df.select(key_col, emb_col).limit(sample_n)
    a = sample.select(F.col(key_col).alias("id_a"), F.col(emb_col).alias("ea"))
    b = sample.select(F.col(key_col).alias("id_b"), F.col(emb_col).alias("eb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    from external_benchmarks_spark.functions.vector import cosine_similarity

    cos = cosine_similarity("ea", "eb")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(cos), 6).alias("mean_cos"),
        F.round(F.stddev_samp(cos), 6).alias("std_cos"),
        F.round(F.min(cos), 6).alias("min_cos"),
        F.round(F.max(cos), 6).alias("max_cos"),
    )
