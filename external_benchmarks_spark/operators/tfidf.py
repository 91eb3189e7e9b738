"""TF-IDF top terms per document — the corpus-weighted cousin of the
plain term-frequency query (training-data pipelines use it for keyword
extraction and quality filtering).

Shape: ONE explode pass builds the (doc, term, tf) table; document
frequency is a groupBy(term) count of that table — map-side partial
aggregation shrinks the shuffle to |vocabulary| — broadcast-joined back,
so the full tf table is never reshuffled by term; per-doc ranking is a
window over doc_id. Shuffles: tf agg, tiny dfreq agg, rank-by-doc.

Ranking determinism: Spark's Math.log and DuckDB's std::log can disagree
in the last ulp, so the rank ORDER BY uses the score rounded to 6
decimals (then the term as tiebreak) on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from external_benchmarks_spark.functions.text import tokens


def tfidf_top_terms(
    df: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    top_n: int = 3,
    broadcast_dfreq: bool = True,
) -> DataFrame:
    """Top-n terms per document by tf * ln((N+1)/(df+1)).

    ``broadcast_dfreq=False`` for web-scale vocabularies (100M+ distinct
    terms) where the doc-frequency table exceeds broadcast limits — the
    join falls back to a shuffle join on term, which AQE sizes; the tf
    table is then shuffled by term once (still never twice).
    """
    n_docs = df.count()  # metadata-fast count; reused as a literal below
    toks = df.select(
        F.col(key_col), F.explode(tokens(F.col(content_col))).alias("term")
    )
    tf = toks.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc_freq: aggregate the tf table to |vocabulary| rows and broadcast
    # it back. A count-window over term would reshuffle the ENTIRE tf
    # table by term; this shuffles only map-side-combined partials.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    if broadcast_dfreq:
        dfreq = F.broadcast(dfreq)
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("doc_freq") + 1.0)),
            6,
        ),
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_n)
        .select(key_col, "term", "tfidf", "rn")
    )


def bm25_contrib_fp(n_docs: int, avgdl: float, k1: float, b: float):
    """The ONE copy of the per-(doc, term) BM25 fixed-point contribution
    (Lucene idf variant, 1e-6 fixed point): every scorer — direct,
    indexed, batch — builds its score from this expression over columns
    (tf, df, dl), which is what keeps their results (and the shared SQL
    oracles) bit-identical."""
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return F.round(contrib * 1_000_000.0, 0).cast("bigint")


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones, the Lucene idf
    variant): top-k documents for a bag of query terms.

    Shape: the term filter lands BEFORE the tf aggregation, so only
    query-term occurrences ever shuffle (|q| terms x matching docs, not
    the corpus vocabulary); doc length comes from a per-row size() with
    no explode; per-(doc,term) contributions are rounded to 1e-6
    fixed-point BIGINT and summed as integers, so the per-doc sum is
    partition-order-independent and hash-matches the SQL oracle exactly
    (the lm_score pattern). TakeOrderedAndProject for the top-k.
    """
    base = df.filter(F.col(content_col).isNotNull())
    dl = base.select(
        F.col(key_col), F.size(tokens(F.col(content_col))).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        return df.sparkSession.createDataFrame(
            [], f"{key_col} bigint, bm25 double"
        )
    avgdl = float(stats["total"]) / n_docs
    toks = base.select(
        F.col(key_col), F.explode(tokens(F.col(content_col))).alias("term")
    ).filter(F.col("term").isin([t.lower() for t in query_terms]))
    tf = toks.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # dfreq is |q| rows -> broadcast; dl is corpus-sized -> keyed join
    # (AQE picks the strategy; the tf side is already filtered to docs
    # containing query terms, so the shuffle is match-bounded).
    scored = tf.join(F.broadcast(dfreq), "term").join(dl, key_col)
    fp = bm25_contrib_fp(n_docs, avgdl, k1, b)
    return (
        scored.select(F.col(key_col), fp.alias("fp"))
        .groupBy(key_col)
        .agg(F.sum("fp").alias("score_fp"))
        .select(
            key_col,
            (F.col("score_fp").cast("double") / 1_000_000.0).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(key_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Inverted-index tier: build postings once, score queries from buckets
# ---------------------------------------------------------------------------

def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Python twin of functions/hashing.md5_hash32 % n_buckets — used to
    compute the pruning set driver-side without a Spark job."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _tf_dl(
    df: DataFrame, key_col: str, content_col: str
) -> tuple[DataFrame, DataFrame]:
    """(per-(doc,term) tf table, per-doc length table) for non-null docs."""
    base = df.filter(F.col(content_col).isNotNull())
    dl = base.select(
        F.col(key_col), F.size(tokens(F.col(content_col))).alias("dl")
    )
    tf = (
        base.select(
            F.col(key_col), F.explode(tokens(F.col(content_col))).alias("term")
        )
        .groupBy(key_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf, dl


def _write_postings(
    tf: DataFrame,
    dl: DataFrame,
    out_path: str,
    key_col: str,
    n_term_buckets: int,
    mode: str = "overwrite",
) -> None:
    import os

    from external_benchmarks_spark.functions.hashing import md5_hash32

    postings = tf.join(dl, key_col).withColumn(
        "term_bucket", md5_hash32(F.col("term")) % n_term_buckets
    )
    (
        postings.repartition(F.col("term_bucket"))
        .sortWithinPartitions("term", key_col)
        .write.mode(mode)
        .partitionBy("term_bucket")
        .parquet(os.path.join(out_path, "postings"))
    )


def build_inverted_index(
    df: DataFrame,
    out_path: str,
    key_col: str = "doc_id",
    content_col: str = "text",
    n_term_buckets: int = 64,
) -> None:
    """Materialize the BM25 postings layout ONCE (the IVF-cells idea
    applied to terms), in three incrementally-maintainable pieces:

    - ``postings/``: (doc_id, term, tf, dl) partitioned on
      term_bucket = md5_hash32(term) % n_term_buckets. Query-time
      scoring reads ONLY the buckets containing the query's terms —
      partition pruning for text retrieval, |q|/n_buckets of the index
      instead of a corpus re-tokenization per query (bm25_topk's shape).
      New documents APPEND here (their rows land in their term buckets)
      without touching existing rows, because nothing corpus-global is
      denormalized into a posting: tf and dl are per-document facts.
    - ``dfreq/``: (term, df) partitioned on the same term_bucket —
      |vocabulary| rows, read pruned to the query's buckets and
      broadcast. Kept OUT of the postings rows precisely so that
      appending documents only rewrites the AFFECTED dfreq buckets, not
      every posting of every touched term.
    - ``stats/``: one row (n_docs, sum_dl) — mergeable counters (sum_dl
      instead of a precomputed avgdl, so an append is add-and-rewrite of
      one row; avgdl = sum_dl/n_docs is derived at query time with the
      same float division bm25_topk performs).
    """
    import os

    from external_benchmarks_spark.functions.hashing import md5_hash32

    tf, dl = _tf_dl(df, key_col, content_col)
    _write_postings(tf, dl, out_path, key_col, n_term_buckets)
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("term_bucket", md5_hash32(F.col("term")) % n_term_buckets)
    )
    (
        dfreq.repartition(F.col("term_bucket"))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(out_path, "dfreq"))
    )
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    ).write.mode("overwrite").parquet(os.path.join(out_path, "stats"))


def ensure_inverted_index(
    df: DataFrame,
    out_path: str,
    source_paths: list[str],
    key_col: str = "doc_id",
    content_col: str = "text",
    n_term_buckets: int = 64,
) -> bool:
    """Build the inverted index only if the source changed since the
    last build (pipeline/layout fingerprint: file path+size+mtime, no
    Spark job). Returns True when a build ran, False on reuse — the
    steady-state query path is then a pure partition-pruned READ with no
    WriteFiles anywhere (the amortized layout contract)."""
    from external_benchmarks_spark.pipeline.layout import (
        layout_is_current,
        record_layout,
        source_fingerprint,
    )

    fp = source_fingerprint(
        source_paths, extra={"n_term_buckets": n_term_buckets, "v": 2}
    )
    if layout_is_current(out_path, fp):
        return False
    build_inverted_index(df, out_path, key_col, content_col, n_term_buckets)
    record_layout(out_path, fp)
    return True


def append_to_inverted_index(
    spark,
    index_path: str,
    new_docs: DataFrame,
    key_col: str = "doc_id",
    content_col: str = "text",
    n_term_buckets: int = 64,
) -> None:
    """Incrementally index NEW documents (keys not already indexed)
    without a full rebuild — the upsert-side maintenance path.

    Cost is O(delta + affected buckets), not O(corpus):
    - postings: pure APPEND of the new docs' rows into their term
      buckets (existing files untouched).
    - dfreq: only the buckets containing a delta term are rewritten
      (dynamic partition overwrite), merged as old df + delta df.
    - stats: one-row add-and-rewrite of the mergeable counters.

    Equivalence to a full rebuild is exact (tested bit-identical):
    every piece is an associative merge of per-document facts.
    """
    import os

    from external_benchmarks_spark.functions.hashing import md5_hash32
    from external_benchmarks_spark.pipeline.layout import invalidate_layout

    # The index no longer matches any recorded source fingerprint: drop
    # the marker FIRST so a crash mid-append can never leave a layout
    # that ensure_inverted_index would reuse as "current" while its
    # postings/dfreq/stats include (or half-include) the delta.
    invalidate_layout(index_path)

    tf, dl = _tf_dl(new_docs, key_col, content_col)
    # Cache: tf/dl feed postings, dfreq delta, and the stats delta.
    tf = tf.localCheckpoint(eager=True)
    dl = dl.localCheckpoint(eager=True)

    _write_postings(tf, dl, index_path, key_col, n_term_buckets, mode="append")

    delta_df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("term_bucket", md5_hash32(F.col("term")) % n_term_buckets)
        .localCheckpoint(eager=True)
    )
    affected = sorted(
        r["term_bucket"]
        for r in delta_df.select("term_bucket").distinct().collect()
    )
    dfreq_path = os.path.join(index_path, "dfreq")
    old = spark.read.parquet(dfreq_path).where(
        F.col("term_bucket").isin(affected)
    )
    merged = (
        old.select("term", F.col("df").alias("df_old"))
        .join(
            delta_df.select("term", F.col("df").alias("df_new")),
            "term",
            "full_outer",
        )
        .select(
            "term",
            (
                F.coalesce(F.col("df_old"), F.lit(0))
                + F.coalesce(F.col("df_new"), F.lit(0))
            ).alias("df"),
            (md5_hash32(F.col("term")) % n_term_buckets).alias("term_bucket"),
        )
        # The overwrite below deletes the partitions being read — break
        # the read-your-writes cycle by materializing first.
        .localCheckpoint(eager=True)
    )
    (
        merged.repartition(F.col("term_bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket")
        .parquet(dfreq_path)
    )

    stats_path = os.path.join(index_path, "stats")
    old_stats = spark.read.parquet(stats_path).collect()[0]
    delta_stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("bigint").alias("s")
    ).collect()[0]
    spark.createDataFrame(
        [
            (
                int(old_stats["n_docs"]) + int(delta_stats["n"]),
                int(old_stats["sum_dl"]) + int(delta_stats["s"] or 0),
            )
        ],
        "n_docs bigint, sum_dl bigint",
    ).write.mode("overwrite").parquet(stats_path)


def bm25_from_index(
    spark,
    index_path: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    key_col: str = "doc_id",
    n_term_buckets: int = 64,
) -> DataFrame:
    """BM25 top-k off the materialized postings — bit-identical to
    bm25_topk (same fixed-point contribution math, tested), but the
    postings and dfreq scans are partition-pruned to the query terms'
    buckets; the only join is posting rows x a broadcast |q|-row dfreq
    slice — no corpus-sized join or explode at all."""
    import os

    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_term_bucket_py(t, n_term_buckets) for t in terms})
    stats = spark.read.parquet(os.path.join(index_path, "stats")).collect()[0]
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        return spark.createDataFrame([], f"{key_col} bigint, bm25 double")
    # Same float division bm25_topk performs driver-side.
    avgdl = float(stats["sum_dl"]) / n_docs
    dfreq = (
        spark.read.parquet(os.path.join(index_path, "dfreq"))
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(terms))
        .select("term", "df")
    )
    p = (
        spark.read.parquet(os.path.join(index_path, "postings"))
        .where(F.col("term_bucket").isin(buckets))
        .where(F.col("term").isin(terms))
        .join(F.broadcast(dfreq), "term")
    )
    fp = bm25_contrib_fp(n_docs, avgdl, k1, b)
    return (
        p.select(F.col(key_col), fp.alias("fp"))
        .groupBy(key_col)
        .agg(F.sum("fp").alias("score_fp"))
        .select(
            key_col,
            (F.col("score_fp").cast("double") / 1_000_000.0).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(key_col))
        .limit(k)
    )


def bm25_batch(
    df: DataFrame,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Batch-of-queries BM25: score EVERY query in ONE corpus pass — the
    serving-throughput shape (amortize the scan over Q queries, the text
    twin of operators/topk.per_query_topk).

    The union of query terms filters the token stream BEFORE the tf
    aggregation (only matching occurrences shuffle); the (query, term)
    table is a broadcast of a few dozen rows; per-(query, doc)
    contributions use the same 1e-6 fixed point as bm25_topk, so every
    score is bit-identical to running that query alone — and to the SQL
    oracle. Ranking is a per-query row_number window over the
    match-bounded scored set, never the corpus.
    """
    base = df.filter(F.col(content_col).isNotNull())
    dl = base.select(
        F.col(key_col), F.size(tokens(F.col(content_col))).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"])
    if n_docs == 0:
        return df.sparkSession.createDataFrame(
            [], f"query_id bigint, {key_col} bigint, bm25 double, rank bigint"
        )
    avgdl = float(stats["total"]) / n_docs
    qt_rows = sorted(
        {
            (int(qid), t.lower())
            for qid, terms in queries.items()
            for t in terms
        }
    )
    qt = df.sparkSession.createDataFrame(
        qt_rows, "query_id bigint, term string"
    )
    all_terms = sorted({t for _, t in qt_rows})
    toks = base.select(
        F.col(key_col), F.explode(tokens(F.col(content_col))).alias("term")
    ).filter(F.col("term").isin(all_terms))
    tf = toks.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .join(dl, key_col)
    )
    fp = bm25_contrib_fp(n_docs, avgdl, k1, b)
    per_doc = (
        scored.select("query_id", F.col(key_col), fp.alias("fp"))
        .groupBy("query_id", key_col)
        .agg(F.sum("fp").alias("score_fp"))
        .select(
            "query_id",
            key_col,
            (F.col("score_fp").cast("double") / 1_000_000.0).alias("bm25"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("bm25"), F.asc(key_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", key_col, "bm25", "rank")
    )
