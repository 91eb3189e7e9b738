"""Grouped Arrow-batch statistics via applyInPandas — the per-category
numpy path of the UDF surface (SURVEY.md §2.8).

The reference computes embedding-geometry statistics with whole-corpus
numpy (reference scripts/generate_benchmark_reports.py:243-274); the
grouped variant is what that becomes on a cluster: groupBy ships each
category's vectors to one executor as Arrow batches, and a numpy kernel
reduces them. Use for statistics that need the group's full matrix at
once (centroids, covariance, spread); for algebraic stats prefer the
pure-SQL forms in operators/stats.py (no Python at all).

Scale: shuffle is one pass keyed by the group column; each group must
fit one executor's memory (fine for per-category stats; for the 41%-hot
Books key, pre-aggregate per partition with mapInPandas and combine, or
salt the group)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

GROUP_EMB_STATS_SCHEMA = StructType(
    [
        StructField("group", LongType()),
        StructField("n_vectors", LongType()),
        StructField("centroid_norm", DoubleType()),
        StructField("mean_norm", DoubleType()),
        StructField("mean_spread", DoubleType()),
    ]
)


def group_embedding_stats(
    df: DataFrame,
    group_col: str = "label",
    emb_col: str = "embedding",
    order_col: str | None = "vec_id",
) -> DataFrame:
    """Per-group embedding geometry: centroid norm, mean vector norm, and
    mean distance-to-centroid (spread). One numpy kernel per group.

    ``order_col`` (when present) fixes each group's row order inside the
    kernel so float summation order — and therefore the result — is
    identical across runs regardless of shuffle arrival order."""

    def stats(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None and order_col in pdf.columns:
            pdf = pdf.sort_values(order_col)
        mat = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64, copy=False)
        centroid = mat.mean(axis=0)
        norms = np.linalg.norm(mat, axis=1)
        spread = np.linalg.norm(mat - centroid, axis=1)
        return pd.DataFrame(
            [
                (
                    int(key[0]),
                    mat.shape[0],
                    float(np.linalg.norm(centroid)),
                    float(norms.mean()),
                    float(spread.mean()),
                )
            ],
            columns=[f.name for f in GROUP_EMB_STATS_SCHEMA.fields],
        )

    cols = [group_col, emb_col]
    if order_col is not None and order_col in df.columns:
        cols.append(order_col)
    return (
        df.select(*cols)
        .groupBy(group_col)
        .applyInPandas(stats, GROUP_EMB_STATS_SCHEMA)
    )
