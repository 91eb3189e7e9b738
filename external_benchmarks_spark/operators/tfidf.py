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
