"""mapInArrow operators: zero-copy Arrow-native batch processing.

Completes the engine's Python-UDF surface matrix (pandas_udf /
mapInPandas / applyInPandas / applyInPandasWithState /
transformWithStateInPandas / UDTF / **mapInArrow**): where the pandas
variants pay an Arrow->pandas conversion per batch, mapInArrow hands
the raw ``pyarrow.RecordBatch`` straight to ``pyarrow.compute`` kernels
— no pandas objects, no Python-per-row work, useful when the per-batch
operation is itself a vectorized Arrow kernel (string scans, casts,
list ops over huge batches).

The shipped op mirrors ``functions/text.token_count`` exactly (count of
whitespace-separated tokens == count of ``\\S+`` runs), asserted equal
to the Catalyst form in tests — the point is the execution surface, not
new semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def token_count_arrow(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(key, n_tokens) via a pyarrow.compute regex scan per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def count_batches(batches):
        for b in batches:
            n = pc.count_substring_regex(
                b.column(text_col), pattern=r"\S+"
            ).cast(pa.int32())
            yield pa.RecordBatch.from_arrays(
                [b.column(key_col), n], names=[key_col, "n_tokens"]
            )

    return df.select(key_col, text_col).mapInArrow(
        count_batches, f"{key_col} long, n_tokens int"
    )
