"""TF-IDF top terms per document — the corpus-weighted cousin of the
plain term-frequency query (training-data pipelines use it for keyword
extraction and quality filtering).

Shape: one explode pass feeds BOTH aggregates (per-doc TF and corpus DF);
the document-frequency table is tiny (|vocabulary| rows) and broadcasts
back onto the TF table; per-doc ranking is a window over doc_id. Two
shuffles total (term, doc), each on a well-spread key.

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
) -> DataFrame:
    """Top-n terms per document by tf * ln((N+1)/(df+1))."""
    n_docs = df.count()  # one small job; reused as a literal below
    toks = df.select(
        F.col(key_col), F.explode(tokens(F.col(content_col))).alias("term")
    )
    tf = toks.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct(key_col).alias("doc_freq")
    )
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
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
