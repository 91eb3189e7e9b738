"""Operator-level invariants for operators/textprep.py (oracle parity is
covered by test_oracle_queries.py; these check semantic properties)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.functions.text import token_count
from external_benchmarks_spark.operators.textprep import (
    build_vocab,
    chunk_documents,
    dataset_split,
    redact_pii,
    repetition_stats,
    sequence_pack,
    vocab_encode,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return Catalog(spark, SF_DIR).documents


def test_chunks_conserve_tokens(spark):
    """Sum of chunk sizes == doc token count; all chunks full except last."""
    d = _docs(spark)
    chunks = chunk_documents(d, chunk_tokens=32)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("sum_chunk"),
        F.max("chunk_id").alias("last_id"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    orig = d.select("doc_id", token_count("text").cast("long").alias("n_tokens"))
    j = per_doc.join(orig, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r.sum_chunk == r.n_tokens, r
        assert r.n_chunks == r.last_id + 1, r
    # every non-final chunk is exactly the chunk size
    bad = (
        chunks.join(per_doc.select("doc_id", "last_id"), "doc_id")
        .filter((F.col("chunk_id") < F.col("last_id")) & (F.col("n_chunk_tokens") != 32))
        .count()
    )
    assert bad == 0


def test_sequence_pack_budget(spark):
    """Every pack's token start-offset span is within one budget window."""
    packs = sequence_pack(_docs(spark), budget=512).collect()
    assert len(packs) > 0
    # pack ids per source are contiguous from 0
    by_src = {}
    for r in packs:
        by_src.setdefault(r.source, []).append(r.pack_id)
    for src, ids in by_src.items():
        ids.sort()
        assert ids == list(range(len(ids))), (src, ids)
    # conservation: total tokens across packs == corpus tokens
    total = sum(r.sum_tokens for r in packs)
    corpus = (
        _docs(spark)
        .select(token_count("text").cast("long").alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == corpus


def test_repetition_bounds(spark):
    rows = repetition_stats(_docs(spark)).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.top_word_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 <= r.dup_trigram_frac <= 1.0
        # trigrams repeat no more often than bigrams on the same text
        assert r.dup_trigram_frac <= r.dup_bigram_frac + 1e-12


def test_vocab_deterministic_and_dense(spark):
    v1 = {(r.term, r.tid) for r in build_vocab(_docs(spark), 64).collect()}
    v2 = {(r.term, r.tid) for r in build_vocab(_docs(spark), 64).collect()}
    assert v1 == v2
    tids = sorted(t for _, t in v1)
    assert tids == list(range(1, len(tids) + 1))


def test_vocab_encode_shape(spark):
    enc = vocab_encode(_docs(spark), vocab_size=64, max_len=16).collect()
    assert len(enc) > 0
    for r in enc:
        ids = r.ids.split("-") if r.ids else []
        # "-1" splits into ["", "1"] — count OOV via the raw string instead
        assert r.n_oov == r.ids.count("--1") + (1 if r.ids.startswith("-1") else 0)
        assert len([i for i in ids if i]) >= 1


def test_dataset_split_stable_and_total(spark):
    d = _docs(spark)
    s = dataset_split(d)
    counts = {r.split: r.cnt for r in s.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(counts.values()) == d.count()
    # splits are disjoint by construction; stability: same assignment twice
    a = {(r.doc_id, r.split) for r in s.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in dataset_split(d).select("doc_id", "split").collect()}
    assert a == b


def test_redact_pii_removes_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail me at a.b@x.io or call +1-555-1234 twice +1-555-9999")],
        ["id", "t"],
    )
    r = redact_pii(df, "t").collect()[0]
    assert r.n_emails == 1 and r.n_phones == 2
    assert "@" not in r.t_redacted
    assert "[EMAIL]" in r.t_redacted and "[PHONE]" in r.t_redacted


def test_decontaminate_flags_planted_overlap(spark):
    from external_benchmarks_spark.operators.textprep import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (0, "intro text then the quick brown fox jumps right here"),  # 5-gram hit
            (1, "completely unrelated content about spark and parquet files"),
            (2, "quick brown fox jumps over something"),  # another hit
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: (r.n_hits, r.contaminated) for r in
            decontaminate(train, bench, n=5).collect()}
    assert rows[0][1] is True and rows[0][0] >= 1
    assert rows[1] == (0, False)
    assert rows[2][1] is True


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.sampling import mixture_sample

    docs = Catalog(spark, sf_dir).documents
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = mixture_sample(docs, "source", "doc_id", rates)
    got = {r.source: r.cnt for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    full = {r.source: r.cnt for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got["src0"] == full["src0"]          # rate 1.0 keeps everything
    assert "src2" not in got                    # rate 0 drops the source
    assert set(got) == {"src0", "src1"}         # unlisted sources dropped
    assert 0 < got["src1"] < full["src1"]       # strict subsample
    again = mixture_sample(docs, "source", "doc_id", rates).count()
    assert again == out.count()                 # deterministic


def test_split_sentences_udtf_matches_catalyst(spark, sf_dir):
    """The Python-UDTF surface and the Catalyst form implement the same
    contract — identical (doc_id, sent_idx, sentence) multisets."""
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.operators.textprep import (
        split_sentences,
        split_sentences_udtf,
    )

    docs = Catalog(spark, sf_dir).documents.limit(80)
    a = sorted(map(tuple, split_sentences(docs).collect()))
    b = sorted(map(tuple, split_sentences_udtf(spark, docs).collect()))
    assert a == b and len(a) > 0


def test_span_dedup_hand_case(spark):
    """Crafted 3-doc corpus (span size 2): the boilerplate span shared
    by docs 1 and 2 drops from BOTH (first copy included); doc 3's
    internally-repeated span stays (intra-doc repetition is not
    cross-doc boilerplate); rebuilt text preserves position order."""
    import hashlib

    from external_benchmarks_spark.operators.textprep import span_dedup

    rows = [
        (1, "buy now click here alpha beta"),
        (2, "buy now click here gamma delta"),
        (3, "same same same same epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["n_dropped"], r["clean_hash"])
        for r in span_dedup(df, span_tokens=2, min_docs=2).collect()
    }
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    # docs 1/2: spans = ["buy now", "click here", tail] — first two are
    # shared boilerplate, only the distinct tail survives
    assert got[1] == (3, 1, 2, h("alpha beta"))
    assert got[2] == (3, 1, 2, h("gamma delta"))
    # doc 3: "same same" repeats WITHIN the doc only — everything stays
    assert got[3] == (3, 3, 0, h("same same same same epsilon zeta"))


# ---------------------------------------------------------------------------
# Incremental span dedup vs the persisted span-count store (round 12)
# ---------------------------------------------------------------------------


def _span_store(spark, corpus, tag):
    from external_benchmarks_spark.operators.textprep import build_span_store

    return build_span_store(spark, corpus, tag=tag, span_tokens=8)


def test_delta_span_dedup_equals_from_scratch(spark, sf_dir):
    """The incremental contract: delta_span_dedup(batch, store(corpus))
    == span_dedup over corpus ∪ batch restricted to batch docs — the
    store's absorbed counts + the batch's own counts reproduce the
    from-scratch COUNT(DISTINCT doc_id) exactly (disjoint doc sets)."""
    from external_benchmarks_spark.operators.textprep import (
        delta_span_dedup,
        span_dedup,
    )

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    delta = d.filter(F.col("doc_id") % 10 == 0)
    store = _span_store(spark, corpus, "t_dsp_eq")
    got = sorted(
        tuple(r) for r in delta_span_dedup(spark, delta, store).collect()
    )
    want = sorted(
        tuple(r)
        for r in span_dedup(d, span_tokens=8, min_docs=2)
        .filter(F.col("doc_id") % 10 == 0)
        .collect()
    )
    assert got == want and len(got) > 0


def test_span_absorb_then_dedup_equals_full_store(spark, sf_dir):
    """absorb_delta_spans(b1) then delta_span_dedup(b2) == a store built
    from corpus ∪ b1 from scratch — counts are associative under the
    disjoint-batch contract, so the absorbed store IS the full store."""
    from external_benchmarks_spark.operators.textprep import (
        absorb_delta_spans,
        delta_span_dedup,
    )

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 > 1)
    b1 = d.filter(F.col("doc_id") % 10 == 1)
    b2 = d.filter(F.col("doc_id") % 10 == 0)

    inc = _span_store(spark, corpus, "t_dsp_absorb")
    absorb_delta_spans(spark, b1, inc)
    got = sorted(
        tuple(r) for r in delta_span_dedup(spark, b2, inc).collect()
    )
    full = _span_store(
        spark, d.filter(F.col("doc_id") % 10 != 0), "t_dsp_full"
    )
    want = sorted(
        tuple(r) for r in delta_span_dedup(spark, b2, full).collect()
    )
    assert got == want and len(got) > 0


def test_compact_span_store_folds_and_preserves(spark, sf_dir):
    """After enough absorbs to cross the threshold, compaction folds the
    store back to one row per span / one file per (pb, bucket) WITHOUT
    changing any per-span total — the delta result is bit-identical and
    the fragmentation measure drops."""
    from external_benchmarks_spark.operators.textprep import (
        absorb_delta_spans,
        compact_span_store,
        delta_span_dedup,
    )
    from external_benchmarks_spark.pipeline.bucketing import max_bucket_files

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 > 4)
    store = _span_store(spark, corpus, "t_dsp_compact")
    for m in (1, 2, 3, 4):
        absorb_delta_spans(spark, d.filter(F.col("doc_id") % 10 == m), store)
    spans_path = os.path.join(store.root, "spans")
    frag_before = max_bucket_files(spans_path)
    assert frag_before > 4  # base + 4 absorbs per touched (pb, bucket)
    delta = d.filter(F.col("doc_id") % 10 == 0)
    before = sorted(
        tuple(r) for r in delta_span_dedup(spark, delta, store).collect()
    )
    out = compact_span_store(spark, store, max_files_per_bucket=4)
    assert out["spans_partitions"]
    assert max_bucket_files(spans_path) <= 4
    # folded: one row per (span, pb) again
    t = spark.table(store.spans_table)
    assert (
        t.groupBy("span").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1).count() == 0
    )
    after = sorted(
        tuple(r) for r in delta_span_dedup(spark, delta, store).collect()
    )
    assert after == before and len(after) > 0


def test_delta_span_dedup_no_exchange_above_store_scan(spark, sf_dir):
    """Plan shape: the corpus span store never reshuffles — no Exchange
    between the bucketed store scan and its per-span SUM/join — and the
    scan is partition-pruned to the delta's pb prefixes."""
    from external_benchmarks_spark.operators.textprep import (
        delta_span_dedup,
    )

    d = Catalog(spark, sf_dir).documents
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    delta = d.filter(F.col("doc_id") % 10 == 0).limit(20)
    store = _span_store(spark, corpus, "t_dsp_plan")
    plan = delta_span_dedup(spark, delta, store)._jdf.queryExecution(
    ).executedPlan().toString()
    lines = plan.splitlines()
    scan_idx = [
        i for i, ln in enumerate(lines)
        if "Scan" in ln and "ds_spans_t_dsp_plan" in ln
    ]
    assert scan_idx, plan
    for i in scan_idx:
        # walk upward from the scan: no SHUFFLE Exchange anywhere in the
        # parent chain (tree prints parents above children at decreasing
        # indent) — the store's per-span SUM must be bucket-local. A
        # BroadcastExchange of the AGGREGATED result is fine (and good):
        # it ships per-span totals of the pruned store, never store rows.
        indent = len(lines[i]) - len(lines[i].lstrip(" +-:"))
        j = i - 1
        while j >= 0:
            ln = lines[j]
            ind = len(ln) - len(ln.lstrip(" +-:"))
            if ind < indent:
                assert "Exchange hashpartitioning" not in ln, plan
                indent = ind
                # the join/broadcast that CONSUMES the store-side agg is
                # the boundary: above it the stream is delta-sized and
                # its shuffles (per-doc rebuild) are legitimate
                if "Join" in ln or "BroadcastExchange" in ln:
                    break
            j -= 1
    assert "Bucketed: true" in plan, plan


def test_delta_span_dedup_hand_case(spark):
    """Crafted corpora (span size 2): a span hot only via corpus+delta
    union (1 corpus doc + 1 delta doc) drops; a delta-internal
    cross-doc span (2 delta docs) drops; a span unique corpus-side and
    absent from the delta changes nothing; intra-doc repeats stay."""
    import hashlib

    from external_benchmarks_spark.operators.textprep import (
        delta_span_dedup,
    )

    from external_benchmarks_spark.operators.textprep import (
        build_span_store,
    )

    corpus = spark.createDataFrame(
        [(100, "buy now unique corpus phrase one")],
        "doc_id long, text string",
    )
    store = build_span_store(spark, corpus, tag="t_dsp_hand", span_tokens=2)
    delta = spark.createDataFrame(
        [
            (1, "buy now alpha beta"),          # "buy now" hot via corpus
            (2, "click here gamma delta"),      # "click here" hot via doc 3
            (3, "click here same same same same"),  # intra-doc repeat stays
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["n_dropped"], r["clean_hash"])
        for r in delta_span_dedup(
            spark, delta, store, min_docs=2
        ).collect()
    }
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got[1] == (2, 1, 1, h("alpha beta"))
    assert got[2] == (2, 1, 1, h("gamma delta"))
    assert got[3] == (3, 2, 1, h("same same same same"))
