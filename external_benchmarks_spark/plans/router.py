"""Layout-aware query routing — SURVEY.md §7.3's planner shim.

``IndexedTable`` wraps an index layout written by
pipeline/index.build_index_layout and routes the benchmark query
(filter + score + top-k) so that:

- equality/IN predicates on the partition column become **partition
  pruning** (directories never listed — the README.md:80-83
  `main_category == 'Computers'` filter skips ~96% of files);
- range predicates on the sort columns hit parquet **row-group min/max
  skipping** (the layout sorted within partitions for exactly this);
- ANN probes filter on the **lsh_bucket** partition key first when the
  layout carries one, or on the **centroid_id** partition key when the
  layout was built with an IVF fit (nprobe nearest cells).

This is plain DataFrame logic, not a Catalyst rule: the layout knowledge
lives in the table object, and Catalyst does the actual pruning once the
predicate lands on partition columns.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.similarity import hyperplanes
from external_benchmarks_spark.operators.topk import filtered_vector_topk


class IndexedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str = "vec_id",
        emb_col: str = "embedding",
        partition_col: str | None = None,
        lsh_planes: np.ndarray | None = None,
        ivf_centroids: np.ndarray | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.emb_col = emb_col
        self.partition_col = partition_col
        self.lsh_planes = lsh_planes
        self.ivf_centroids = ivf_centroids

    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def query(
        self,
        qvec: Sequence[float],
        predicate: Column | None = None,
        partition_values: Sequence | None = None,
        k: int = 100,
        use_lsh: bool = False,
        lsh_hamming: int = 2,
        nprobe: int | None = None,
    ) -> DataFrame:
        """The benchmark query (README.md:72-83) against the layout.

        ``partition_values`` routes the category filter onto the partition
        column (pruning); ``use_lsh`` additionally restricts to LSH
        buckets Hamming-close to the query's bucket; ``nprobe`` restricts
        to the n nearest IVF cells (centroid_id partition pruning).
        """
        df = self.df()
        if partition_values is not None and self.partition_col:
            df = df.filter(F.col(self.partition_col).isin(*partition_values))
        if nprobe is not None and self.ivf_centroids is not None:
            from external_benchmarks_spark.operators.similarity import ivf_probe_cells

            cells = ivf_probe_cells(self.ivf_centroids, qvec, nprobe)
            df = df.filter(F.col("centroid_id").isin(cells))
        if use_lsh and self.lsh_planes is not None:
            qbucket = sum(
                (1 << i)
                for i, plane in enumerate(self.lsh_planes)
                if float(np.dot(plane, qvec)) > 0
            )
            n_planes = len(self.lsh_planes)
            x = F.col("lsh_bucket").bitwiseXOR(F.lit(qbucket).cast("bigint"))
            pop = sum((F.shiftright(x, i) % 2).cast("int") for i in range(n_planes))
            df = df.filter(pop <= lsh_hamming)
        return filtered_vector_topk(
            df, qvec, predicate, k=k, key_col=self.key_col, emb_col=self.emb_col
        )


def build_indexed_table(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    partition_col: str,
    sort_cols: Sequence[str],
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 0,
    n_centroids: int = 0,
    seed: int = 42,
) -> IndexedTable:
    """Write the layout and return the routed table (the 'create index'
    verb, README.md:64). ``n_centroids`` adds an IVF fit: rows are
    assigned to spherical-KMeans cells and ``centroid_id`` becomes an
    extra partition key, so probes prune directories."""
    from external_benchmarks_spark.pipeline.index import build_index_layout

    planes = None
    if n_planes:
        dim = len(source.select(emb_col).first()[0])
        planes = hyperplanes(dim, n_planes, seed)
    centroids = None
    partition_cols = [partition_col] if partition_col else []
    if n_centroids:
        from external_benchmarks_spark.operators.similarity import ivf_assign, ivf_fit

        centroids = ivf_fit(source, n_centroids=n_centroids, emb_col=emb_col, seed=seed)
        source = ivf_assign(source, centroids, emb_col=emb_col)
        partition_cols.append("centroid_id")
    build_index_layout(
        source, path, partition_col=partition_cols, sort_cols=list(sort_cols),
        emb_col=emb_col, lsh_planes=planes,
    )
    return IndexedTable(spark, path, key_col, emb_col, partition_col, planes, centroids)
