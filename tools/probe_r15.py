#!/usr/bin/env python
"""One-off stage-split probes for the r15 optimization round.

Each probe times the component actions of one expensive leg in a fresh
session (noop sink where the component is a transformation), so the
leg's wall splits into named parts. Usage:
    python tools/probe_r15.py sorted_export hybrid_rrf_batch ...
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from external_benchmarks_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"    {label}: {dt:.3f}s")
    return out


def probe_sorted_export(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.pipeline.export import (
        rank_sharded,
        shard_stats,
    )

    c = entry.Catalog(spark, SF)
    o = c.orders.select(
        "o_orderkey",
        entry._cents(F.col("o_totalprice")).alias("cents"),
        F.col("o_orderdate").cast("string").alias("o_orderdate"),
    )
    order_cols = [F.col("cents"), F.col("o_orderkey")]
    for rep in range(3):
        print(f"  rep {rep}:")
        sharded = t("rank_sharded (lazy+ckpt+counts)", lambda: rank_sharded(o, order_cols, n_shards=8))
        sharded = sharded.persist()
        stats = shard_stats(
            sharded, hash_cols=["o_orderkey", "cents", "o_orderdate"], key_col="cents"
        ).orderBy("shard")
        t("stats collect (materializes persist)", lambda: stats.collect())
        sharded.unpersist()


def probe_hybrid_rrf_batch(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.operators.tfidf import bm25_batch
    from external_benchmarks_spark.operators.topk import rrf_fuse_per_query

    c = entry.Catalog(spark, SF)
    for rep in range(3):
        print(f"  rep {rep}:")
        lex = bm25_batch(c.documents, entry.BM25_BATCH, k=50).select(
            "query_id", F.col("doc_id").alias("id"), F.col("rank").alias("rank_lex")
        )
        t("lex (bm25_batch k=50)", lambda: noop(lex))
        e = c.embeddings
        queries = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        dense = entry.per_query_topk(e, queries, k=50, item_key="vec_id").select(
            "query_id", F.col("vec_id").alias("id"),
            F.col("rank").cast("bigint").alias("rank_vec"),
        )
        t("dense (per_query_topk k=50)", lambda: noop(dense))
        fused = rrf_fuse_per_query(
            lex, dense, query_col="query_id", key_col="id",
            rank_a_col="rank_lex", rank_b_col="rank_vec", k=10,
        )
        t("full fuse (recomputes both)", lambda: noop(fused))


def probe_symdelete(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.operators.fuzzyjoin import fuzzy_term_pairs
    from external_benchmarks_spark.operators.ranking import global_rank_with_total

    c = entry.Catalog(spark, SF).customer.select(F.col("c_name").alias("term"))
    for rep in range(3):
        print(f"  rep {rep}:")
        tdf = (
            c.select(F.col("term").alias("_t"))
            .filter(F.col("_t").isNotNull() & (F.length("_t") > 0))
            .distinct()
        )
        dic = t("dict rank (2 ckpt jobs)", lambda: global_rank_with_total(tdf, ["_t"], rank_col="_tid")[0].localCheckpoint(eager=True))
        out = fuzzy_term_pairs(c).orderBy("term_a", "term_b")
        t("full leg", lambda: noop(out))


def probe_span_clean_export(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.operators.dedup import keep_best
    from external_benchmarks_spark.operators.textprep import span_dedup
    from external_benchmarks_spark.pipeline.export import rank_sharded

    d = entry.Catalog(spark, SF).documents
    for rep in range(3):
        print(f"  rep {rep}:")
        keepers = keep_best(
            d, entry.fingerprint("text"), entry.quality_score("text")
        ).select(F.col("keeper_id").alias("doc_id"))
        t("keep_best", lambda: noop(keepers))
        cleaned = span_dedup(d, span_tokens=8, min_docs=2).filter(F.col("n_kept") > 0)
        t("span_dedup", lambda: noop(cleaned))
        rows = cleaned.join(keepers, "doc_id").join(
            d.select("doc_id", "source"), "doc_id"
        )
        full = rank_sharded(rows, ["source", "doc_id"], n_shards=8).select(
            "doc_id", "source", "n_spans", "n_kept", "clean_hash",
            "global_rank", "shard",
        ).orderBy("global_rank")
        t("full leg (recomputes both)", lambda: noop(full))


def probe_delta_dedup(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.operators.deltadedup import delta_dedup

    store = entry._delta_store(spark, SF)
    delta = entry.Catalog(spark, SF).documents.filter(F.col("doc_id") % 10 == 0)
    for rep in range(3):
        print(f"  rep {rep}:")
        out = delta_dedup(spark, delta, store)
        t("full delta_dedup", lambda: noop(out))


def probe_qsketch_grouped(spark):
    import __spark_entry__ as entry

    q = entry.queries()["qsketch_grouped"]
    for rep in range(3):
        print(f"  rep {rep}:")
        t("full leg", lambda: noop(q(spark, SF)))


def probe_pq_rerank_topk(spark):
    import __spark_entry__ as entry
    from external_benchmarks_spark.operators.quantize import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )
    from external_benchmarks_spark.functions.vector import dot_product_literal

    e = entry.Catalog(spark, SF).embeddings
    for rep in range(3):
        print(f"  rep {rep}:")
        cb = t("pq_codebooks (64-row collect)", lambda: pq_codebooks(e, n_codes=entry.PQR_CODES, m_subspaces=entry.PQR_M))
        enc = pq_encode(e, cb)
        t("pq_encode (mapInPandas)", lambda: noop(enc))
        cand = pq_adc_topk(enc, cb, entry.QVEC, k=250).select("vec_id")
        t("adc_topk (encode+LUT+TakeOrdered)", lambda: noop(cand))
        full = e.join(F.broadcast(cand), "vec_id").select(
            "vec_id",
            dot_product_literal(F.col("embedding").cast("array<double>"), entry.QVEC).alias("score"),
        ).orderBy(F.desc("score"), F.asc("vec_id")).limit(50)
        t("full leg (recomputes cand)", lambda: noop(full))


def probe_ingest_report(spark):
    import __spark_entry__ as entry

    q = entry.queries()["ingest_report"]
    for rep in range(3):
        print(f"  rep {rep}:")
        t("full leg", lambda: q(spark, SF).count())


PROBES = {
    "pq_rerank_topk": probe_pq_rerank_topk,
    "ingest_report": probe_ingest_report,
    "sorted_export": probe_sorted_export,
    "hybrid_rrf_batch": probe_hybrid_rrf_batch,
    "symdelete_name_pairs": probe_symdelete,
    "span_clean_export": probe_span_clean_export,
    "delta_dedup": probe_delta_dedup,
    "qsketch_grouped": probe_qsketch_grouped,
}


def main():
    spark = get_spark("probe-r15")
    spark.range(1).count()
    # Arrow worker warmup
    import __spark_entry__ as entry

    for leg in sys.argv[1:]:
        print(f"{leg}:")
        spark.sparkContext.setJobDescription(f"probe:{leg}")
        PROBES[leg](spark)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
