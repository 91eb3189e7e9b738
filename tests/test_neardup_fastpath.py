"""Arrow/BLAS fast path for near-dup pair scoring + block fan-out cap.

The fast path (one Gram matmul per block via applyInPandas) must produce
the IDENTICAL edge set as the Catalyst-HOF form — boundary pairs are
re-scored with the exact fold — and the ``max_block_rows`` cap must give
a drop-only approximation with bounded per-group sizes even for an
adversarial giant cluster of near-identical vectors.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from external_benchmarks_spark.operators.dedup import (
    _subblock_key,
    embedding_neardup_pairs,
)
from external_benchmarks_spark.operators.similarity import (
    ivf_assign,
    sampled_centroids,
    semdedup,
)


def _emb_df(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog

    return Catalog(spark, sf_dir).embeddings


def _edges(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_fast_path_edge_set_identical(spark, sf_dir):
    e = _emb_df(spark, sf_dir)
    hof = embedding_neardup_pairs(e, block_col="label", threshold=0.2)
    fast = embedding_neardup_pairs(
        e, block_col="label", threshold=0.2, use_arrow_fast_path=True
    )
    assert _edges(hof) == _edges(fast)


def test_fast_path_cosine_values_close(spark, sf_dir):
    e = _emb_df(spark, sf_dir)
    hof = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(e, block_col="label", threshold=0.2).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(
            e, block_col="label", threshold=0.2, use_arrow_fast_path=True
        ).collect()
    }
    assert hof.keys() == fast.keys()
    assert all(abs(hof[k] - fast[k]) < 1e-12 for k in hof)


def test_semdedup_fast_path_matches_declarative(spark, sf_dir):
    e = _emb_df(spark, sf_dir)
    cents = sampled_centroids(e, n_centroids=8)
    assigned = ivf_assign(e, cents)
    slow = {tuple(r) for r in semdedup(assigned, cents, threshold=0.2).collect()}
    fast = {
        tuple(r)
        for r in semdedup(
            assigned, cents, threshold=0.2, use_arrow_fast_path=True
        ).collect()
    }
    assert slow == fast


@pytest.fixture(scope="module")
def giant_block(spark):
    """One block of 300 near-identical vectors (adversarial for any
    similarity-preserving split) + 100 scattered vectors, single block
    key — the degenerate cluster the cap exists for."""
    rng = np.random.RandomState(7)
    base = rng.randn(16)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(300):
        v = base + 1e-3 * rng.randn(16)
        rows.append((i, [float(x) for x in v], 0))
    for i in range(300, 400):
        v = rng.randn(16)
        rows.append((i, [float(x) for x in v], 0))
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
        schema="vec_id bigint, embedding array<double>, label int",
    )


def test_cap_is_drop_only(spark, giant_block):
    uncapped = _edges(
        embedding_neardup_pairs(
            giant_block, block_col="label", threshold=0.95, use_arrow_fast_path=True
        )
    )
    capped = _edges(
        embedding_neardup_pairs(
            giant_block,
            block_col="label",
            threshold=0.95,
            use_arrow_fast_path=True,
            max_block_rows=50,
        )
    )
    assert capped <= uncapped  # never invents pairs
    assert len(uncapped) >= 300 * 299 / 2  # the near-identical clique
    assert len(capped) < len(uncapped)  # the cap actually split it


def test_cap_bounds_group_sizes(spark, giant_block):
    """Every sub-block stays near the cap even though the 300-row clique
    is inseparable by LSH — the hash-salt level guarantees the bound."""
    blocked = _subblock_key(giant_block, "label", "embedding", max_block_rows=50)
    sizes = [
        r.n for r in blocked.groupBy("_blk").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(sizes) <= 3 * 50  # expected ~cap under uniform salting
    assert len(sizes) > 4


def test_cap_same_for_both_paths(spark, giant_block):
    hof = _edges(
        embedding_neardup_pairs(
            giant_block, block_col="label", threshold=0.95, max_block_rows=50
        )
    )
    fast = _edges(
        embedding_neardup_pairs(
            giant_block,
            block_col="label",
            threshold=0.95,
            use_arrow_fast_path=True,
            max_block_rows=50,
        )
    )
    assert hof == fast


def test_capped_semdedup_still_deduplicates(spark, giant_block):
    cents = np.vstack([np.zeros(16)])
    cents[0, 0] = 1.0
    assigned = giant_block.withColumn("centroid_id", F.lit(0))
    out = semdedup(
        assigned,
        cents,
        threshold=0.95,
        use_arrow_fast_path=True,
        max_block_rows=50,
    )
    survivors = out.count()
    # the 300-clique collapses (within sub-blocks) — far fewer than 400
    # survive, and every dropped row had a qualifying neighbor
    assert survivors < 200
    assert survivors >= 100  # the 100 scattered rows largely survive


def test_fast_path_empty_and_singleton(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "embedding": [[1.0, 0.0]], "label": [0]}),
        schema="vec_id bigint, embedding array<double>, label int",
    )
    assert (
        embedding_neardup_pairs(
            df, block_col="label", threshold=0.5, use_arrow_fast_path=True
        ).count()
        == 0
    )
    empty = df.filter(F.lit(False))
    assert (
        embedding_neardup_pairs(
            empty, block_col="label", threshold=0.5, use_arrow_fast_path=True
        ).count()
        == 0
    )
