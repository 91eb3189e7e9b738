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


def test_tsne_separates_structured_clusters(spark):
    """t-SNE on two well-separated gaussian blobs must produce two
    separated 2-D clusters (inter-centroid distance >> intra spread)."""
    import numpy as np

    from external_benchmarks_spark.operators.projection import tsne_project

    rng = np.random.RandomState(0)
    a = rng.randn(60, 16) * 0.05
    b = rng.randn(60, 16) * 0.05
    b[:, 0] += 10.0
    rows = [(i, [float(v) for v in a[i]]) for i in range(60)] + [
        (100 + i, [float(v) for v in b[i]]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: np.array(r.tsne) for r in tsne_project(df, max_rows=200, perplexity=15.0, n_iter=500).collect()}
    assert len(out) == 120 and all(len(v) == 2 for v in out.values())
    # structure preservation: each point's 2-D nearest neighbors are
    # overwhelmingly from its own cluster (kNN purity — robust to
    # t-SNE's cluster-expanding geometry)
    ids = sorted(out)
    y = np.vstack([out[i] for i in ids])
    lab = np.array([0 if i < 100 else 1 for i in ids])
    d = ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :5]
    purity = (lab[nn] == lab[:, None]).mean()
    assert purity > 0.9, purity
    # determinism: same seed -> same layout
    again = {r.vec_id: np.array(r.tsne) for r in tsne_project(df, max_rows=200, perplexity=15.0, n_iter=500).collect()}
    assert all(np.allclose(out[k], again[k]) for k in out)


def test_spectral_project_separates_components(spark):
    """Laplacian eigenmaps: two disconnected kNN blobs land at clearly
    different coordinates along the first nontrivial eigenvectors."""
    import numpy as np

    from external_benchmarks_spark.operators.projection import spectral_project

    rng = np.random.RandomState(1)
    a = rng.randn(40, 8) * 0.05
    b = rng.randn(40, 8) * 0.05 + 5.0
    rows = [(i, [float(v) for v in a[i]]) for i in range(40)] + [
        (100 + i, [float(v) for v in b[i]]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: np.array(r.spectral) for r in spectral_project(df, n_neighbors=5).collect()}
    assert len(out) == 80
    ca = np.mean([out[i][0] for i in range(40)])
    cb = np.mean([out[100 + i][0] for i in range(40)])
    ia = np.std([out[i][0] for i in range(40)])
    ib = np.std([out[100 + i][0] for i in range(40)])
    assert abs(ca - cb) > 5.0 * max(ia, ib, 1e-9)


def test_umap_project_requires_or_uses_dep(spark, sf_dir):
    """umap-learn absent: clean ImportError pointing at spectral_project.
    Present: real UMAP output with the right shape (skip-marked so the
    optional path runs wherever the dep exists)."""
    import pytest

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.projection import umap_project

    try:
        import umap  # noqa: F401

        have = True
    except ImportError:
        have = False
    e = Catalog(spark, sf_dir).embeddings
    if not have:
        with pytest.raises(ImportError, match="spectral_project"):
            umap_project(e, max_rows=50)
        pytest.skip("umap-learn not installed; fallback contract verified")
    out = umap_project(e, n_components=2, max_rows=50).collect()
    assert len(out) == min(50, e.count())
    assert all(len(r.umap) == 2 for r in out)


def test_sentence_transformer_encode_contract(spark):
    """Skip-marked: where sentence-transformers IS installed, the model
    path must produce unit-norm vectors at the model's native dim —
    the same contract the hashed fallback satisfies."""
    import numpy as np
    import pandas as pd
    import pytest

    from external_benchmarks_spark.pipeline import embedding as emb_mod

    if not emb_mod.HAVE_MODEL:
        pytest.skip("sentence-transformers not installed")
    mat = emb_mod.encode_batch(
        pd.Series(["hello world", "spark engine"]), emb_mod.DEFAULT_DIM
    )
    assert mat.shape == (2, emb_mod.DEFAULT_DIM)
    norms = np.linalg.norm(mat, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_projection_scatter_figure(spark, sf_dir, tmp_path):
    """PCA scatter figure: real PNG out, points actually rasterized,
    labels colored from the join (the reference's report page figure)."""
    import numpy as np

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.multimodal.codecs import decode_png
    from external_benchmarks_spark.operators.projection import pca_project
    from external_benchmarks_spark.pipeline.plots import projection_figure

    e = Catalog(spark, sf_dir).embeddings
    proj = pca_project(e, k=2)
    out = projection_figure(
        proj, "pc", str(tmp_path / "pca.png"), label_df=e
    )
    img = decode_png(open(out, "rb").read())
    assert img.shape == (480, 640, 3)
    # plotted pixels: non-white, non-grid colors present
    flat = img.reshape(-1, 3)
    colored = np.abs(flat.astype(int) - 255).sum(axis=1) > 150
    assert colored.sum() > 50
