"""Embedding-space projection for visualization — the reference computes
PCA / t-SNE / UMAP on a bounded sample for its report figures
(reference scripts/generate_benchmark_reports.py:449-478).

Spark mapping (SURVEY.md §2.8): PCA runs distributed via MLlib (the
covariance accumulates over all partitions — works at any scale);
t-SNE/UMAP are inherently driver-side on a bounded sample and are out of
scope here (viz-only; the PCA output is what the reports consume).
"""

from __future__ import annotations

from pyspark.ml.feature import PCA
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    k: int = 2,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Project the embedding column to k principal components.

    Output: (key, pc array<double> of length k). Distributed: MLlib's PCA
    computes the Gramian via treeAggregate — no driver materialization of
    rows, only the (dim x dim) covariance (2688^2 doubles ~ 58 MB at the
    reference's dim — fine on a driver).
    """
    vecs = df.select(
        F.col(key_col),
        array_to_vector(F.col(emb_col).cast("array<double>")).alias("_v"),
    )
    model = PCA(k=k, inputCol="_v", outputCol="_pc").fit(vecs)
    return model.transform(vecs).select(
        F.col(key_col), vector_to_array(F.col("_pc")).alias("pc")
    )


def explained_variance(df: DataFrame, k: int = 2, emb_col: str = "embedding") -> list[float]:
    vecs = df.select(array_to_vector(F.col(emb_col).cast("array<double>")).alias("_v"))
    model = PCA(k=k, inputCol="_v", outputCol="_pc").fit(vecs)
    return [float(x) for x in model.explainedVariance]
