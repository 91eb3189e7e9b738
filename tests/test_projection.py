from __future__ import annotations

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.operators.projection import (
    explained_variance,
    pca_project,
)


def test_pca_project_shape(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    out = pca_project(emb, k=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(len(r.pc) == 2 for r in rows)


def test_explained_variance_monotone(spark, sf_dir):
    emb = Catalog(spark, sf_dir).embeddings
    ev = explained_variance(emb, k=4)
    assert len(ev) == 4
    assert all(ev[i] >= ev[i + 1] for i in range(3))  # sorted components
    assert 0 < sum(ev) <= 1.0 + 1e-9
