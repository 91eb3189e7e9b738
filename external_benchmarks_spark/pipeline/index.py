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


def append_to_index_layout(
    new_df: DataFrame,
    out_path: str,
    partition_col: str | Sequence[str] | None = None,
    sort_cols: Sequence[str] = (),
    emb_col: str | None = "embedding",
    centroids=None,
    metric: str = "cosine",
) -> None:
    """Delta maintenance for a partitioned index layout: route ONLY the
    new rows to their partitions and append files there — O(delta), no
    read or rewrite of the existing corpus.

    For an IVF layout pass ``centroids`` (the FROZEN matrix the layout
    was built with): cell assignment is a pure function of
    (centroids, row), so a probe against the appended layout is
    bit-identical to one against a full rebuild with the same centroids
    (equivalence-tested in tests/test_pipeline.py). Re-fitting centroids
    is a separate, rarer operation — that IS a rebuild, by design, and
    the layout fingerprint (pipeline/layout.py) folds the centroid
    digest in so stale mixes can't be read silently.

    The embedding cast mirrors build_index_layout (float32) so appended
    files carry the identical parquet schema as the originals.

    At 100 TB: upserting a 0.001% delta touches only the delta's cells
    and writes delta-sized files; the existing directory tree is
    untouched (same contract as append_to_inverted_index for the text
    index). Periodically run compact_layout_partitions to fold the
    accumulated small files back to one-per-cell.
    """
    out = new_df
    if centroids is not None and emb_col:
        from external_benchmarks_spark.operators.similarity import ivf_assign

        out = ivf_assign(out, centroids, emb_col, metric)
    if emb_col and emb_col in out.columns:
        out = out.withColumn(emb_col, F.col(emb_col).cast("array<float>"))
    cols = [partition_col] if isinstance(partition_col, str) else list(partition_col or [])
    partition_keys = list(cols) or (
        ["centroid_id"] if centroids is not None else []
    )
    if partition_keys:
        out = out.repartition(*[F.col(c) for c in partition_keys])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("append")
    if partition_keys:
        writer = writer.partitionBy(*partition_keys)
    writer.parquet(out_path)


def compact_layout_partitions(
    spark,
    layout_path: str,
    partition_col: str = "centroid_id",
    max_files_per_partition: int = 4,
) -> list[str]:
    """Fold small appended files back to one file per dirty partition.

    Driver-side directory listing finds partitions whose file count
    exceeds the threshold (O(#partitions), no Spark job); only those are
    read (partition-pruned scan) and rewritten under DYNAMIC partition
    overwrite, so clean partitions' files are never touched. Returns the
    list of compacted partition values.

    Single-writer contract: like the upsert table's writer lease
    (streaming/upsert.py), compaction must not race another writer on
    the same layout — run it from the maintenance job that owns the
    layout. Spark QUERIES against the layout are safe (they resolve the
    file list at plan time and the commit protocol publishes complete
    files), but an external reader that lists the directory mid-commit
    (e.g. the serving tier) can observe a partial file set — pair
    compaction with serving's signature-based refresh() (a changed
    signature means reload; re-check after load when strictness
    matters) or use the UpsertTable's versioned buckets when readers
    need snapshot isolation.
    """
    import os

    dirty: list[str] = []
    prefix = f"{partition_col}="
    for d in sorted(os.listdir(layout_path)):
        if not d.startswith(prefix):
            continue
        part_dir = os.path.join(layout_path, d)
        n_files = sum(
            1 for f in os.listdir(part_dir) if not f.startswith(("_", "."))
        )
        if n_files > max_files_per_partition:
            dirty.append(d[len(prefix):])
    if not dirty:
        return []
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        df = spark.read.parquet(layout_path).filter(
            F.col(partition_col).cast("string").isin(dirty)
        )
        (
            df.repartition(len(dirty), F.col(partition_col))
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(layout_path)
        )
    finally:
        spark.conf.set(conf_key, prev)
    return dirty


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
