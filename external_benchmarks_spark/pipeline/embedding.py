"""Batch text embedding — the dominant cost of the reference's dataset
production (README.md:52-55: BAAI/bge-small-en-v1.5, 384 dims per field,
7 fields concatenated to 2,688).

Spark shape: an Arrow-batched pandas UDF so the model runs once per
executor and scores whole batches; ``mapInPandas`` variant keeps the
model cached across batches within a task. The actual transformer is NOT
available in this container, so the model call is stubbed with a
deterministic fake (seeded by token content) behind the same signature —
the Spark plumbing (schema, batching, concat) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 384

# The reference's seven embedded fields (README.md:52-55).
EMBED_FIELDS = (
    "title",
    "description",
    "features",
    "combined_text",
    "main_category",
    "categories",
    "store",
)


def _fake_encode(texts: "pd.Series", dim: int) -> np.ndarray:
    """Deterministic stand-in for a sentence-transformer encode() call.

    Each text hashes to a seed; the unit-normalized vector is stable across
    processes/executors. Swap this single function for
    ``SentenceTransformer.encode`` in a real deployment.
    """
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(
            hashlib.md5((t or "").encode("utf-8")).digest()[:4], "big"
        )
        rng = np.random.RandomState(seed)
        v = rng.randn(dim).astype(np.float32)
        out[i] = v / (np.linalg.norm(v) or 1.0)
    return out


def embed_text_udf(dim: int = DEFAULT_DIM):
    """Scalar pandas_udf: string column -> unit-norm float vector.

    Arrow batches keep the Python boundary amortized; at 2,688 total dims
    and 10k-row batches this moves ~100 MB/batch, matching the executor
    memory budget in session.py.
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        mat = _fake_encode(texts, dim)
        return pd.Series(list(mat))

    return embed


def embed_fields(df: DataFrame, fields=EMBED_FIELDS, dim: int = DEFAULT_DIM) -> DataFrame:
    """Per-field embedding + concatenation (README.md:52-55): each text
    field embeds to ``dim`` floats; the product embedding is their concat
    (so each field-block is unit-norm => total L2 = sqrt(n_fields),
    the invariant the reference reports at benchmark_10k/README.md:70)."""
    embed = embed_text_udf(dim)
    out = df
    vec_cols: list[Column] = []
    for f in fields:
        if f in df.columns:
            out = out.withColumn(f"_emb_{f}", embed(F.coalesce(F.col(f), F.lit(""))))
            vec_cols.append(F.col(f"_emb_{f}"))
    out = out.withColumn("embedding", F.concat(*vec_cols))
    return out.drop(*[f"_emb_{f}" for f in fields if f in df.columns])


def reembed_batch(pdf_iter: Iterator[pd.DataFrame], text_col: str, dim: int) -> Iterator[pd.DataFrame]:
    """mapInPandas body for the upsert path: re-embed changed rows with the
    model held once per task (streaming/upsert.py)."""
    for pdf in pdf_iter:
        mat = _fake_encode(pdf[text_col], dim)
        pdf = pdf.copy()
        pdf["embedding"] = list(mat)
        yield pdf
