"""Index build = writing the query-optimized physical layout.

The reference's "Create Index from scratch < 2 hrs on 10M"
(README.md:64) maps in Spark to producing a layout where the benchmark
predicates (README.md:78-83) prune I/O (SURVEY.md §7.5):

- **partitionBy(category col)**: the `main_category == 'Computers'`
  equality prunes whole directories (~96% of data skipped for a 3%
  category).
- **sortWithinPartitions(numeric filter cols)**: parquet row-group
  min/max stats then prune the `average_rating <= X AND
  rating_number > Y` ranges within each partition.
- **float32 embeddings**: halves the dominant column's bytes
  (SURVEY.md §7.4).
- optional **LSH bucket column** (similarity.lsh_bucket_col) as a second
  partition key so ANN probes touch one bucket per partition.

At 100 TB this is a single shuffle (the repartition) + sorted write;
no driver materialization anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_index_layout(
    df: DataFrame,
    out_path: str,
    partition_col: str | Sequence[str] | None = None,
    sort_cols: Sequence[str] = (),
    emb_col: str | None = "embedding",
    lsh_planes=None,
    target_file_rows: int | None = None,
) -> None:
    out = df
    if emb_col and emb_col in df.columns:
        out = out.withColumn(emb_col, F.col(emb_col).cast("array<float>"))
    if lsh_planes is not None and emb_col:
        from external_benchmarks_spark.operators.similarity import lsh_bucket_udf

        out = out.withColumn("lsh_bucket", lsh_bucket_udf(lsh_planes)(F.col(emb_col)))
    cols = [partition_col] if isinstance(partition_col, str) else list(partition_col or [])
    partition_keys = [c for c in (*cols, "lsh_bucket" if lsh_planes is not None else None) if c]
    if partition_keys:
        out = out.repartition(*[F.col(c) for c in partition_keys])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("overwrite")
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    writer.parquet(out_path)


def zorder_key(col_a, col_b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative ints — sorting by
    it clusters BOTH dimensions, so parquet row-group min/max stats prune
    2-D predicates (e.g. the reference's rating x review-count templates,
    README.md:80-82) instead of only the primary sort column.

    Pure Catalyst bit math (one expression, codegen-friendly). Values are
    clamped to ``bits`` (caller buckets/offsets real values into that
    range first — for doubles, quantile-bucket then interleave).
    """
    from pyspark.sql import functions as F

    a = F.least(F.greatest(col_a.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1))
    b = F.least(F.greatest(col_b.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(a, i) % 2) * F.lit(1 << (2 * i)).cast("bigint")
            + (F.shiftright(b, i) % 2) * F.lit(1 << (2 * i + 1)).cast("bigint")
        )
    return z


def read_index(spark, path: str) -> DataFrame:
    """Read back the layout; partition columns come in as directory keys,
    so equality predicates on them prune at planning time."""
    return spark.read.parquet(path)
