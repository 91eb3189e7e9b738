"""The reference's core benchmark query: filtered vector top-k.

Reference README.md:72-83 defines it:

    candidates = products WHERE <metadata predicate>
    scored     = dot(candidates.embedding, qvec)
    return top-k(scored, k=100) -> key

Physical shape we want (and get — verified via .explain("formatted")):

  Parquet scan with PushedFilters (the metadata predicate) and ReadSchema
  pruned to {key, filter cols, embedding}  ->  per-batch scoring
  ->  TakeOrderedAndProject (per-partition top-k, single merge; never a
  full sort).

At 100 TB the scan dominates; the predicate prunes row groups via
min/max stats and — with the index layout in pipeline/index.py —
whole partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from external_benchmarks_spark.functions.vector import (
    dot_product,
    dot_product_literal,
    score_batch_udf,
)


def filtered_vector_topk(
    df: DataFrame,
    qvec: Sequence[float],
    predicate: Column | None,
    k: int = 100,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    use_arrow_fast_path: bool = True,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Reference README.md:73-75: predicate -> dot score -> top-k -> key.

    ``use_arrow_fast_path`` switches between the numpy-matmul pandas_udf
    (production, high-dim) and the exact Catalyst HOF form (oracle parity).
    Ties broken by key for deterministic output (SURVEY.md §5.3).
    """
    out = df
    if predicate is not None:
        out = out.filter(predicate)
    scorer = (
        score_batch_udf(qvec)(F.col(emb_col))
        if use_arrow_fast_path
        else dot_product_literal(emb_col, qvec)
    )
    out = out.withColumn("score", scorer)
    cols = [key_col, *extra_cols, "score"]
    # orderBy+limit plans as TakeOrderedAndProject: per-partition heap top-k
    # then one merge — no global sort, no shuffle of the full table.
    return out.select(*cols).orderBy(F.desc("score"), F.asc(key_col)).limit(k)


def per_query_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 100,
    item_key: str = "vec_id",
    item_emb: str = "embedding",
    query_key: str = "query_id",
    query_emb: str = "qvec",
) -> DataFrame:
    """Batch-of-queries top-k (reference README.md:73 'rotate query vectors').

    Broadcast the (small) query set against the (huge) item table, score
    each pair, then rank within each query — the one genuine window-function
    use in the workload (SURVEY.md §2.5). The broadcast avoids shuffling
    the item table; the window shuffles only (n_items x n_queries) scored
    rows, which the caller bounds by pre-filtering.
    """
    joined = items.crossJoin(F.broadcast(queries))
    scored = joined.withColumn("score", dot_product(item_emb, query_emb))
    w = Window.partitionBy(query_key).orderBy(F.desc("score"), F.asc(item_key))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, item_key, "score", "rank")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, query_key: str, item_key: str) -> DataFrame:
    """Recall of an approximate top-k vs the exact oracle, per query.

    Reference README.md:76 (>90% average recall requirement). left-semi
    join keyed on (query, item); both sides are top-k result sets (small),
    so this broadcasts.
    """
    hits = approx.join(
        F.broadcast(exact.select(query_key, item_key)), [query_key, item_key], "left_semi"
    )
    per_query_hits = hits.groupBy(query_key).agg(F.count("*").alias("hits"))
    totals = exact.groupBy(query_key).agg(F.count("*").alias("total"))
    return per_query_hits.join(totals, query_key).select(
        query_key, (F.col("hits") / F.col("total")).alias("recall")
    )
