"""Invariance/property tests for text + dedup functions (SURVEY.md §5.2):
fingerprints must ignore order/duplication, hashes must be stable, and
the cross-engine hash must equal its DuckDB twin on arbitrary strings."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from external_benchmarks_spark.functions.hashing import (
    md5_hash32,
    md5_hash32_sql,
    minhash_params,
)
from external_benchmarks_spark.functions.text import fingerprint, lang_id, tokens
from external_benchmarks_spark.operators.dedup import minhash_signature, simhash


def test_md5_hash32_matches_duckdb(spark):
    strings = ["", "a", "hello world", "ünïcödé", "x" * 500, "tab\there", "42"]
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    spark_vals = {r.s: r.h for r in df.select("s", md5_hash32("s").alias("h")).collect()}
    con = duckdb.connect()
    for s in strings:
        duck = con.execute(f"SELECT {md5_hash32_sql('?')}", [s]).fetchone()[0]
        assert spark_vals[s] == duck, s


def test_fingerprint_order_and_dup_invariant(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma alpha beta"),          # shuffled
            (3, "alpha alpha beta gamma"),    # duplicated token
            (4, "alpha beta delta"),          # genuinely different
        ],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_minhash_identical_docs_identical_sigs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "something else here")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: tuple(r[f"mh{j}"] for j in range(16))
            for r in minhash_signature(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_simhash_near_vs_far(spark):
    base = "spark query engine with columnar execution and vectorized reads"
    near = base + " extra"
    far = "completely different words about cooking pasta tonight friends"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    fp = {r.doc_id: r.simhash for r in simhash(df).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(fp[1], fp[2]) < hamming(fp[1], fp[3])


def test_tokens_whitespace_handling(spark):
    df = spark.createDataFrame([("  Hello   WORLD \t mixed\nCase  ",)], ["text"])
    out = df.select(tokens("text").alias("t")).collect()[0].t
    assert out == ["hello", "world", "mixed", "case"]


def test_lang_id_marker_detection(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el gato y la casa de los perros"),
            (3, "der hund und die katze ist von den"),
            (4, "zzz qqq www"),  # no markers -> und
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.p for r in df.select("doc_id", lang_id("text").alias("p")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_minhash_params_deterministic():
    assert minhash_params(16, 42) == minhash_params(16, 42)
    assert minhash_params(16, 42) != minhash_params(16, 43)
    for a, b in minhash_params(64, 7):
        assert 1 <= a < (1 << 30) and 0 <= b < (1 << 61) - 1


def test_product_schema_validation(spark):
    from external_benchmarks_spark.schemas import (
        PRODUCT_SCHEMA,
        SchemaMismatch,
        validate_schema,
    )
    import pytest

    empty = spark.createDataFrame([], PRODUCT_SCHEMA)
    validate_schema(empty)  # no raise
    drifted = empty.withColumn("price", F.col("price").cast("float"))
    with pytest.raises(SchemaMismatch, match="type drift: price"):
        validate_schema(drifted)
    with pytest.raises(SchemaMismatch, match="missing column"):
        validate_schema(empty.drop("store"))


def test_map_in_arrow_token_count_equals_catalyst(spark, sf_dir):
    """mapInArrow surface: the Arrow-kernel token counter must agree
    with the Catalyst token_count on every document."""
    import pyspark.sql.functions as F

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.functions.arrowops import token_count_arrow
    from external_benchmarks_spark.functions.text import token_count

    docs = Catalog(spark, sf_dir).documents
    arrow = {
        r["doc_id"]: r["n_tokens"] for r in token_count_arrow(docs).collect()
    }
    catalyst = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", token_count("text").alias("n")
        ).collect()
    }
    assert arrow == catalyst


def test_bm25_batch_matches_individual_queries(spark, sf_dir):
    """Each query's batch scores must be bit-identical to running that
    query alone through bm25_topk."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import bm25_batch, bm25_topk

    docs = Catalog(spark, sf_dir).documents
    batch = {0: ["spark", "hash"], 1: ["merge", "window"]}
    got = bm25_batch(docs, batch, k=15).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["bm25"]))
    for qid, terms in batch.items():
        solo = [
            (r["doc_id"], r["bm25"])
            for r in bm25_topk(docs, terms, k=15).collect()
        ]
        assert sorted(by_q[qid], key=lambda t: (-t[1], t[0])) == solo, qid


def test_bm25_three_scorers_bit_identical(spark, sf_dir, tmp_path):
    """Direct, indexed, and batch BM25 must produce bit-identical
    (doc, score) sets for the same query — the contract the shared
    bm25_contrib_fp helper exists to keep."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        bm25_batch,
        bm25_from_index,
        bm25_topk,
        build_inverted_index,
    )

    docs = Catalog(spark, sf_dir).documents
    terms = ["spark", "window"]
    direct = [(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, terms, k=25).collect()]
    idx = str(tmp_path / "idx3")
    build_inverted_index(docs, idx, n_term_buckets=16)
    indexed = [
        (r["doc_id"], r["bm25"])
        for r in bm25_from_index(spark, idx, terms, k=25, n_term_buckets=16).collect()
    ]
    batch = sorted(
        (
            (r["doc_id"], r["bm25"])
            for r in bm25_batch(docs, {0: terms}, k=25).collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    assert direct == indexed == batch


def test_bm25_batch_from_index_matches_direct_batch(spark, sf_dir, tmp_path):
    """r16: the indexed batch scorer (hybrid_rrf_batch's lexical side)
    must be row-identical — ranks included — to the direct two-pass
    bm25_batch over the same corpus and queries."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.tfidf import (
        bm25_batch,
        bm25_batch_from_index,
        build_inverted_index,
    )

    docs = Catalog(spark, sf_dir).documents
    batch = {0: ["spark", "hash"], 1: ["merge", "window"], 2: ["spark", "window"]}
    idx = str(tmp_path / "idxb")
    build_inverted_index(docs, idx, n_term_buckets=16)
    direct = sorted(
        tuple(r)
        for r in bm25_batch(docs, batch, k=25).collect()
    )
    indexed = sorted(
        tuple(r)
        for r in bm25_batch_from_index(
            spark, idx, batch, k=25, n_term_buckets=16
        ).collect()
    )
    assert direct == indexed and direct
