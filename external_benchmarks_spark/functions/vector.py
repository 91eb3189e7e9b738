"""Vector scalar functions: dot product, L2 norm, cosine similarity.

Two tiers, per SURVEY.md §7.4:

1. **Catalyst higher-order-function forms** (this module's Column builders):
   exact, oracle-parity-friendly (left-to-right summation matches DuckDB's
   ``list_dot_product``), zero Python in the loop. Fine up to ~100-dim.
2. **Arrow-batched numpy fast path** (``score_batch_udf``): collects the
   embedding column of each Arrow batch into one (batch x dim) float
   matrix and does a single matmul against the query vector. This is the
   hot path for the reference's 2,688-dim workload
   (reference README.md:52-55,73) — 10-100x over per-row HOFs.

All element arithmetic is done in DOUBLE regardless of storage type
(embeddings are stored float32 for size, SURVEY.md §7.4).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Exact dot product of two array columns (left-to-right summation).

    Mirrors the reference's query scoring (README.md:73) and DuckDB's
    ``list_dot_product`` summation order, so results are bit-identical.
    """
    pairs = F.zip_with(_to_double(_col(a)), _to_double(_col(b)), lambda x, y: x * y)
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def dot_product_literal(a: Column | str, q: Sequence[float]) -> Column:
    """Dot product of an array column against a fixed query vector.

    Unrolled as a flat sum (element_at(a,i)*q_i + ...) rather than a
    zip_with against an array literal: stays in whole-stage codegen and
    keeps left-to-right order for oracle parity.
    """
    arr = _col(a)
    terms = [
        F.element_at(arr, i + 1).cast("double") * F.lit(float(v))
        for i, v in enumerate(q)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def l2_norm(a: Column | str) -> Column:
    """sqrt(sum(x^2)) — reference scripts/generate_benchmark_reports.py:271."""
    sq = F.aggregate(
        _to_double(_col(a)), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| * |b|) — reference :527-529 (sklearn cosine_similarity)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_literal(a: Column | str, q: Sequence[float]) -> Column:
    qnorm = float(np.sqrt(np.dot(q, q)))
    return dot_product_literal(a, q) / (l2_norm(a) * F.lit(qnorm))


# ---------------------------------------------------------------------------
# Arrow-batched fast path (the 100 TB hot loop)
# ---------------------------------------------------------------------------

def score_batch_udf(qvec: Sequence[float], normalize: bool = False):
    """pandas_udf scoring an embedding column against a fixed query vector.

    One numpy matmul per Arrow batch; with
    spark.sql.execution.arrow.maxRecordsPerBatch=10000 and dim=2688 the
    batch matrix is ~100 MB float64 — within executor memory, and the
    matmul is BLAS-backed.
    """
    q = np.asarray(qvec, dtype=np.float64)
    if normalize:
        q = q / np.linalg.norm(q)

    @F.pandas_udf(DoubleType())
    def score(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())  # (batch, dim)
        mat = mat.astype(np.float64, copy=False)
        s = mat @ q
        if normalize:
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0.0] = 1.0
            s = s / norms
        return pd.Series(s)

    return score
