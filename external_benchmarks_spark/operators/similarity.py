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
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


def lsh_bucket_udf(planes: np.ndarray):
    """Sign-bit bucket id of an embedding column: bit i = dot(emb, plane_i) > 0.

    Arrow-batched numpy: one (batch x dim) @ (dim x planes) matmul per
    batch. A pure-Catalyst unrolled form was tried and rejected — at
    64 dims x 8 planes the generated Java method exceeds janino limits and
    falls back to interpreted eval (slower than the Arrow hop).
    """
    mat = np.ascontiguousarray(planes.T, dtype=np.float64)  # (dim, n_planes)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
        bits = (m @ mat) > 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    min_matching_bits: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ANN: score only rows whose LSH bucket is Hamming-close to the query's.

    With ``min_matching_bits == n_planes`` this scans one bucket (fastest,
    lowest recall); lowering it widens the probe (multi-probe LSH).
    Measured on the synthetic UNIFORM random vectors, recall>=0.9 needs a
    wide probe (>=3 of 8 bits, ~80% scanned) — uniform data is LSH's
    worst case; clustered real-world embeddings prune far better. The
    recall/speed trade-off is asserted in tests/test_similarity.py per the
    reference's >90% recall requirement (README.md:76).
    """
    planes = hyperplanes(len(qvec), n_planes, seed)
    qbucket = sum(
        (1 << i) for i, plane in enumerate(planes) if float(np.dot(plane, qvec)) > 0
    )
    bucket = lsh_bucket_udf(planes)(F.col(emb_col))
    # popcount(bucket XOR qbucket) over n_planes bits — small expression,
    # stays in codegen (the heavy dot products live in the Arrow batch).
    x = bucket.bitwiseXOR(F.lit(qbucket).cast("bigint"))
    pop = sum((F.shiftright(x, i) % 2).cast("int") for i in range(n_planes))
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
