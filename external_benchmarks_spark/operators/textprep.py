"""Training-data text-preparation operators: repetition metrics, token-window
chunking, sequence packing, vocabulary encoding, dataset splits, PII
redaction.

These are the curation ops a 100 TB pretraining pipeline runs after the
quality scoring in ``functions/text.py`` and the dedup family in
``operators/dedup.py``. The reference's dataset-production pipeline
(/root/reference/README.md:45-56) stops at derived columns + uniform
sampling; these extend it per the north-star brief.

Scale design: every hot path is either a pure Catalyst expression (runs in
whole-stage codegen, zero shuffle) or an explode->groupBy keyed by
(doc_id, term) — a shuffle that partitions evenly because doc_id is unique.
No Python UDFs, no driver-side materialization, no window over a global
ordering except where explicitly bounded (vocabulary top-V after a
distributed TakeOrderedAndProject).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from external_benchmarks_spark.functions.hashing import md5_hash32
from external_benchmarks_spark.functions.text import tokens

# Dialect-portable PII patterns (valid in both Java regex and RE2).
EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_REGEX = "\\+1-555-[0-9]{4}"


def _ngrams(toks: Column, n: int) -> Column:
    """Adjacent n-grams (space-joined) of a token array; [] below n tokens.

    transform over an index sequence instead of explode: stays inside
    codegen, no shuffle. Guarded with `when` because Spark's
    sequence(0, -1) would count DOWN, not produce an empty array.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + 1 + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality metrics per document.

    - top_word_frac: fraction of tokens that are the single most frequent
      token (explode -> groupBy(doc_id, term): even keyed shuffle).
    - dup_bigram_frac / dup_trigram_frac: fraction of n-gram occurrences
      that are repeats (1 - distinct/total), computed per-row with
      array_distinct — pure codegen, no shuffle at all.

    Each ratio is a single integer/integer division, so Spark and the
    DuckDB oracle are bit-identical without rounding.
    """
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("n_tokens")
    )
    bg, tg = _ngrams(F.col("toks"), 2), _ngrams(F.col("toks"), 3)

    def dup_frac(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            (F.size(g) - F.size(F.array_distinct(g))) / F.size(g),
        ).otherwise(F.lit(0.0))

    per_row = base.select(
        "doc_id",
        "n_tokens",
        "toks",
        dup_frac(bg).alias("dup_bigram_frac"),
        dup_frac(tg).alias("dup_trigram_frac"),
    )
    top = (
        per_row.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_cnt"))
    )
    return (
        per_row.drop("toks")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") > 0, F.col("max_cnt") / F.col("n_tokens")
            )
            .otherwise(F.lit(0.0))
            .alias("top_word_frac"),
            "dup_bigram_frac",
            "dup_trigram_frac",
        )
    )


def doc_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, span_id, span): each document's non-overlapping
    ``span_tokens``-token windows, space-joined — the fan-out shared by
    the batch (:func:`span_dedup`) and incremental
    (:func:`delta_span_dedup`) forms. Pure codegen + one posexplode,
    no shuffle; empty documents emit no rows."""
    toks = tokens(F.col(content_col))
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.array_join(
                F.slice(toks, i * span_tokens + 1, span_tokens), " "
            ),
        ),
    )
    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.posexplode(spans).alias("span_id", "span"),
    )


def _span_rebuild(s: DataFrame, kept: DataFrame) -> DataFrame:
    """The shared output tail of both span-dedup forms: per-doc totals
    from the full span table ``s``, per-doc rebuild stats from the
    surviving spans ``kept`` — (doc_id, n_spans, n_kept, n_dropped,
    clean_hash), clean_hash = md5 of survivors re-joined in position
    order ('' when everything dropped)."""
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_id", "span"))),
                lambda x: x["span"],
            ),
            " ",
        ).alias("_clean"),
    )
    totals = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_spans"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.col("n_spans").cast("bigint").alias("n_spans"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_spans") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
        F.md5(F.coalesce("_clean", F.lit(""))).alias("clean_hash"),
    )


def span_dedup(
    docs: DataFrame, span_tokens: int = 8, min_docs: int = 2
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (CCNet's paragraph-dedup
    shape, on fixed token windows since the benchmark corpus has no
    newlines) — the dedup family's missing transform member:
    ``repetition_stats``/``dup_span_stats`` only DIAGNOSE duplication,
    and the doc-level dedup ops keep/drop whole documents; real
    pretraining curation also strips the boilerplate spans shared
    ACROSS documents while keeping the documents.

    Rule: a span (non-overlapping ``span_tokens``-token window) whose
    exact text appears in >= ``min_docs`` DISTINCT documents is removed
    from every document (CCNet removes all copies, first included —
    boilerplate is noise wherever it appears); spans repeated only
    WITHIN one document stay (that is intra-doc repetition,
    ``repetition_stats``' business). Output per input doc:
    (doc_id, n_spans, n_kept, n_dropped, clean_hash) with clean_hash =
    md5 of the surviving spans re-joined in position order ('' when
    everything dropped) — the rebuilt text pinned without shipping it.

    Scale shape: one posexplode fan-out (no shuffle), the hot-span set
    via a map-side-combinable two-phase distinct-count over (span,
    doc_id), one anti-join back (hot spans are heavy hitters — a small
    broadcast side in practice; Spark falls back to a shuffle join past
    the threshold, still an equi-join), and a per-doc bounded groupBy
    for the rebuild. No corpus-sized window, no cartesian anywhere.

    The eager localCheckpoint materializes a CORPUS-sized span table per
    run — the right trade for the one-shot batch form (the three
    consumers re-tokenize otherwise; measured 7.7 s cold / 1.5 s warm at
    sf0.1 vs 1.6 / 1.2 checkpointed), but at 100 TB the amortized form
    is :func:`delta_span_dedup` below, whose span counts live in a
    persisted bucketed store instead (r11 verdict finding #2)."""
    # eager=False (r15): the consumer's first action materializes the
    # span table in-job — same reuse, one scheduling round-trip fewer
    s = doc_spans(docs, span_tokens).localCheckpoint(eager=False)
    hot = (
        s.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("span")
    )
    kept = s.join(hot, "span", "left_anti")
    return _span_rebuild(s, kept)


# ---------------------------------------------------------------------------
# Incremental span dedup vs a PERSISTED span-count store (round 12) — the
# delta form of span_dedup, completing the dedup family's incremental
# story (operators/deltadedup.py's signature-store pattern applied to
# CCNet-style cross-doc span removal). Counts are ASSOCIATIVE under the
# daily-batch contract (delta doc_ids are disjoint from the corpus), so
# per-batch distinct-doc counts simply ADD to the store's — which is what
# makes absorb-then-dedup == from-scratch (tested) and absorb an O(delta)
# bucket-aligned append instead of a corpus rewrite.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpanStore:
    """Handles + parameters of a persisted span-count store: one bucketed
    external parquet table ``spans(span, n_docs, pb)`` — bucketed+sorted
    by ``span`` (Exchange-free store-side join/agg), directory-partitioned
    by ``pb`` = first hex char of md5(span) (a small delta's lookup prunes
    corpus files at planning time, the delta_dedup band-table device)."""

    spans_table: str
    span_tokens: int
    n_buckets: int
    root: str = ""


def _span_counts(s: DataFrame) -> DataFrame:
    """(span, n_docs, pb): per-span DISTINCT-doc counts of one doc set,
    plus the 16-way pruning prefix. The groupBy is keyed by span — a
    map-side-combinable two-phase distinct-count, never all-pairs."""
    return (
        s.groupBy("span")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
        .withColumn("pb", F.substring(F.md5("span"), 1, 1))
    )


def build_span_store(
    spark: SparkSession,
    corpus: DataFrame,
    tag: str,
    span_tokens: int = 8,
    key_col: str = "doc_id",
    content_col: str = "text",
    n_buckets: int = 8,
    source_paths: list[str] | None = None,
) -> SpanStore:
    """Build (or fingerprint-reuse) the persisted corpus span-count
    store. One corpus scan; with ``source_paths`` the build is skipped
    when the corpus files + parameters are unchanged and the table is
    already in this session's catalog (pipeline/layout fingerprinting,
    same contract as build_signature_store)."""
    from external_benchmarks_spark.pipeline.bucketing import (
        bucket_root,
        write_bucketed,
    )
    from external_benchmarks_spark.pipeline.layout import (
        layout_is_current,
        record_layout,
        source_fingerprint,
    )

    store = SpanStore(
        spans_table=f"ds_spans_{tag}",
        span_tokens=span_tokens,
        n_buckets=n_buckets,
        root=bucket_root(f"ds_{tag}"),
    )
    fp = None
    if source_paths is not None:
        fp = source_fingerprint(
            source_paths,
            extra={"span_tokens": span_tokens, "n_buckets": n_buckets,
                   "v": 1},
        )
        if layout_is_current(store.root, fp) and spark.catalog.tableExists(
            store.spans_table
        ):
            return store
    write_bucketed(
        _span_counts(doc_spans(corpus, span_tokens, key_col, content_col)),
        store.spans_table,
        key="span",
        n_buckets=n_buckets,
        path=os.path.join(store.root, "spans"),
        partition_col="pb",
    )
    if fp is not None:
        record_layout(store.root, fp)
    return store


def _recover_span_store(spark: SparkSession, store: SpanStore) -> None:
    """Crash recovery before any read: a compact_span_store that died
    mid-swap leaves a ``pb=`` partition in trash; restore it (and refresh
    the catalog file index) before reading — same contract as
    deltadedup._recover_store_swaps."""
    from external_benchmarks_spark.pipeline.layout import (
        recover_partition_swaps,
    )

    if store.root and recover_partition_swaps(
        os.path.join(store.root, "spans")
    ):
        spark.catalog.refreshTable(store.spans_table)


def delta_span_dedup(
    spark: SparkSession,
    delta: DataFrame,
    store: SpanStore,
    min_docs: int = 2,
    key_col: str = "doc_id",
    content_col: str = "text",
    prune: bool = True,
) -> DataFrame:
    """:func:`span_dedup` for the NEW batch only, against corpus ∪ batch,
    WITHOUT rescanning the corpus: a delta span is hot when (its distinct
    doc count within the batch) + (the store's absorbed corpus count)
    reaches ``min_docs``. Output rows — (doc_id, n_spans, n_kept,
    n_dropped, clean_hash) — equal the batch form run over corpus ∪ delta
    restricted to delta docs (the registry oracle's from-scratch replay).

    Scale shape: every frame except the store read is DELTA-sized (the
    localCheckpoint here is delta-sized — unlike the batch form's
    corpus-sized one); the store read is partition-pruned to the <= 16
    ``pb`` prefixes the delta touches, its per-span SUM is bucket-local
    (no Exchange above the store scan — plan-asserted in
    tests/test_textprep.py), and the count join repartitions the DELTA
    side to the store's bucketing, so corpus rows never shuffle."""
    _recover_span_store(spark, store)
    s = doc_spans(
        delta, store.span_tokens, key_col, content_col
    ).localCheckpoint(eager=True)
    d_cnt = _span_counts(s)
    corpus = spark.table(store.spans_table)
    if prune:
        pbs = [r[0] for r in d_cnt.select("pb").distinct().collect()]
        corpus = corpus.filter(F.col("pb").isin(pbs))
    # absorb appends one row per (batch, span): SUM folds them — counts
    # are associative because batch doc sets are disjoint by contract
    corpus_cnt = corpus.groupBy("span").agg(F.sum("n_docs").alias("_cn"))
    hot = (
        d_cnt.repartition(store.n_buckets, F.col("span"))
        .join(corpus_cnt, "span", "left")
        .filter(
            F.col("n_docs") + F.coalesce("_cn", F.lit(0))
            >= F.lit(int(min_docs))
        )
        .select("span")
    )
    kept = s.join(hot, "span", "left_anti")
    return _span_rebuild(s, kept)


def absorb_delta_spans(
    spark: SparkSession,
    delta: DataFrame,
    store: SpanStore,
    key_col: str = "doc_id",
    content_col: str = "text",
) -> None:
    """The daily loop's second half: APPEND the batch's per-span
    distinct-doc counts so tomorrow's delta sees corpus ∪ batch. The
    repartition aligns write tasks with buckets (pmod(murmur3, n) IS the
    bucket function), so one absorb adds ONE file per (pb, bucket) —
    the same small-files guard as deltadedup.absorb_delta. The layout
    fingerprint invalidates: the store no longer derives from the
    original source files alone."""
    from external_benchmarks_spark.pipeline.layout import invalidate_layout

    (
        _span_counts(doc_spans(delta, store.span_tokens, key_col,
                               content_col))
        .repartition(store.n_buckets, F.col("span"))
        .select("span", "n_docs", "pb")  # partition column last
        .write.mode("append")
        .insertInto(store.spans_table)
    )
    if store.root:
        invalidate_layout(store.root)


def compact_span_store(
    spark: SparkSession, store: SpanStore, max_files_per_bucket: int = 4
) -> dict:
    """Fold per-batch absorb appends back to ONE ROW per span and one
    file per (pb partition, bucket): the rewrite re-aggregates
    SUM(n_docs) per span — counts are associative, so folding rows is
    exactly the read-side SUM materialized — then swaps each dirty
    partition in with two renames (pipeline/layout protocol; crash
    recovery via _recover_span_store). Compaction changes the physical
    rows, not the logical per-span totals — any recorded layout
    fingerprint stays valid. Returns {"spans_partitions": [...]}."""
    import shutil

    from external_benchmarks_spark.pipeline.bucketing import (
        aligned_bucketed_read,
        bucket_file_counts,
        write_bucketed,
    )
    from external_benchmarks_spark.pipeline.layout import (
        recover_partition_swaps,
        swap_partition_dir,
    )

    spans_path = os.path.join(store.root, "spans")
    recover_partition_swaps(spans_path)
    dirty = []
    for d in sorted(os.listdir(spans_path)):
        if not d.startswith("pb="):
            continue
        per_bucket = bucket_file_counts(os.path.join(spans_path, d))
        if per_bucket and max(per_bucket.values()) > max_files_per_bucket:
            dirty.append(d)
    if not dirty:
        return {"spans_partitions": []}
    vals = [d[len("pb="):] for d in dirty]
    staging_tbl = f"{store.spans_table}_cstage"
    staging_path = spans_path + "_cstage"
    shutil.rmtree(staging_path, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {staging_tbl}")
    with aligned_bucketed_read(spark):
        write_bucketed(
            spark.table(store.spans_table)
            .filter(F.col("pb").isin(vals))
            .groupBy("span", "pb")
            .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
            .select("span", "n_docs", "pb"),
            staging_tbl,
            key="span",
            n_buckets=store.n_buckets,
            path=staging_path,
            partition_col="pb",
        )
    spark.sql(f"DROP TABLE IF EXISTS {staging_tbl}")
    for d in dirty:
        staged = os.path.join(staging_path, d)
        if not os.path.isdir(staged):
            continue
        swap_partition_dir(spans_path, d, staged)
    shutil.rmtree(staging_path, ignore_errors=True)
    spark.catalog.refreshTable(store.spans_table)
    return {"spans_partitions": vals}


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32) -> DataFrame:
    """Split each document into fixed-size token windows (context chunks).

    The doc -> chunks fan-out every pretraining tokenizer pipeline needs.
    Pure codegen: transform(sequence) builds the chunk list per row, one
    posexplode emits chunks; no shuffle, output partitioning inherits the
    scan. Empty documents produce no chunks.
    """
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(toks, i * chunk_tokens + 1, chunk_tokens),
        ),
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("chunk").cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(F.col("chunk"), " ")).alias("chunk_hash"),
        )
    )


def sequence_pack(
    docs: DataFrame, budget: int = 512, part_col: str = "source"
) -> DataFrame:
    """Assign documents to fixed token-budget packs (training sequences).

    Offset-based packing: within each shard (`part_col`), documents are
    laid out in doc_id order and a document belongs to the pack where its
    starting token offset falls. Deterministic, single window pass, and
    shard-parallel — the window partitions by `part_col`, so at 100 TB the
    shuffle is per-shard, never global. (True first-fit bin packing needs
    sequential state; offset packing is the streaming-friendly variant
    with at most one straddle per boundary.)

    Returns one row per (shard, pack_id): n_docs, sum_tokens.
    """
    tok = tokens(F.col("text"))
    w = (
        Window.partitionBy(part_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = docs.select(
        part_col, "doc_id", F.size(tok).cast("long").alias("n_tokens")
    ).withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)),
    )
    return per_doc.groupBy(part_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


def build_vocab(docs: DataFrame, vocab_size: int = 64) -> DataFrame:
    """Top-V corpus vocabulary with dense integer ids.

    Term counts via explode->groupBy (map-side partial agg keeps the
    shuffle at |vocabulary|), then TakeOrderedAndProject for the top-V —
    the full term set never funnels through one partition; only the V
    survivors see the (tiny) row_number window.
    """
    term_counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(vocab_size)
    )
    rank_w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    return term_counts.select(
        "term", F.row_number().over(rank_w).cast("long").alias("tid")
    )


def vocab_encode(
    docs: DataFrame, vocab_size: int = 64, max_len: int = 16
) -> DataFrame:
    """Encode each document's first `max_len` tokens as vocabulary ids.

    The vocabulary (<= vocab_size rows) is broadcast, so encoding is a
    map-side join — no shuffle of the corpus. OOV tokens encode as -1.
    Output: doc_id, ids ('-'-joined id string), n_oov.
    """
    vocab = build_vocab(docs, vocab_size)
    toks = tokens(F.col("text"))
    enc = docs.select(
        "doc_id", F.posexplode(F.slice(toks, 1, max_len)).alias("pos", "term")
    )
    joined = enc.join(F.broadcast(vocab), "term", "left")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.coalesce("tid", F.lit(-1)).alias("tid")))
    )
    return joined.groupBy("doc_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["tid"].cast("string")), "-"
        ).alias("ids"),
        F.sum(F.col("tid").isNull().cast("long")).alias("n_oov"),
    )


def dataset_split(
    docs: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[int, int] = (80, 10),
    salt: str = "split:",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    Buckets on the cross-engine md5 hash (functions/hashing.py) of the
    key, so the split is stable across runs, engines, and cluster sizes —
    the property random()-based splits lack. Pure codegen, no shuffle
    until the caller aggregates.
    """
    bucket = md5_hash32(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 100
    train_hi, val_hi = weights[0], weights[0] + weights[1]
    return docs.withColumn(
        "split",
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample(
    docs: DataFrame,
    score: Column,
    rate: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "ws:",
) -> DataFrame:
    """Quality-weighted deterministic subsample.

    Acceptance probability = rate * score (score in [0,1]): a document is
    kept iff hash(key) % 10^6 < floor(rate * score * 10^6). Deterministic
    (cross-engine md5 hash, no RNG), so the sample is reproducible across
    runs, engines, and cluster sizes — and the comparison in the
    acceptance test is integer-exact. Pure codegen, no shuffle.
    """
    bucket = (
        md5_hash32(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 1_000_000
    )
    threshold = F.floor(F.lit(rate) * score * F.lit(1_000_000.0))
    return docs.filter(bucket < threshold)


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Count and redact email/phone patterns in a text column.

    Adds n_emails, n_phones, and `<text_col>_redacted` with matches
    replaced by [EMAIL] / [PHONE] placeholders. Regexes are restricted to
    a dialect both Java regex and RE2 (DuckDB oracle) accept. Pure
    codegen — regexp ops are JVM-side.
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_REGEX, "[EMAIL]"), PHONE_REGEX, "[PHONE]"
    )
    return df.withColumn(
        "n_emails", F.regexp_count(c, F.lit(EMAIL_REGEX)).cast("long")
    ).withColumn(
        "n_phones", F.regexp_count(c, F.lit(PHONE_REGEX)).cast("long")
    ).withColumn(f"{text_col}_redacted", redacted)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with an evaluation corpus (the standard pre-training
    hygiene step — GPT-3 App. C / PaLM-style n-gram overlap checks).

    Shape for 100 TB: the BENCHMARK side is small by nature (eval sets),
    so its distinct n-gram set broadcasts; the training side explodes to
    (doc, gram) and left-semi joins — a map-side hash probe per gram, no
    shuffle of the corpus. Returns (key, n_hits, contaminated) where
    n_hits counts DISTINCT overlapping n-grams.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    grams = F.array_distinct(_ngrams(toks, n))
    doc_grams = docs.select(
        F.col(key_col), F.explode(grams).alias("gram")
    )
    bench_grams = benchmark.select(F.explode(grams).alias("gram")).distinct()
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(key_col)
        .join(hits, key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_sentences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sent_idx, sentence): split on terminal punctuation runs
    followed by whitespace — the regex `[.!?]+[ \\t\\n]+` evaluates
    identically in Java (Spark), RE2 (DuckDB), and Python `re`, which is
    what makes the result hash-checkable across engines. Pure Catalyst:
    split -> drop empties -> posexplode; zero shuffle, fan-out only
    (the production form; the UDTF below is the same contract through
    Spark's Python-UDTF surface)."""
    parts = F.filter(
        F.split(F.col(text_col), r"[.!?]+[ \t\n]+"), lambda x: x != F.lit("")
    )
    return (
        docs.select(F.col(id_col), F.posexplode(parts).alias("pos", "sentence"))
        .select(
            id_col,
            (F.col("pos") + 1).cast("int").alias("sent_idx"),
            "sentence",
        )
    )


def split_sentences_udtf(spark, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The SAME sentence-split contract through Spark's Python UDTF
    surface (one eval per row, variable rows out) — completing the UDF
    matrix: pandas_udf scalar, mapInPandas, applyInPandas,
    applyInPandasWithState, and UDTF. Row-at-a-time Python is the slow
    path by this repo's own rules, so `split_sentences` (pure Catalyst)
    is the production form; equality of the two is asserted in
    tests/test_textprep.py."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, sent_idx: int, sentence: string")
    class SplitSentences:
        def eval(self, doc_id, text):
            if text is None:
                return
            idx = 0
            for part in re.split(r"[.!?]+[ \t\n]+", text):
                if part != "":
                    idx += 1
                    yield doc_id, idx, part

    import uuid

    # Unique names per call: a fixed view/function name would let
    # concurrent callers on the same session clobber each other's input
    # mid-query (same pattern as _stream_to_table's memory-sink names).
    tag = uuid.uuid4().hex
    fn = f"split_sentences_udtf_{tag}"
    view = f"_udtf_docs_in_{tag}"
    spark.udtf.register(fn, SplitSentences)
    docs.select(id_col, text_col).createOrReplaceTempView(view)
    out = spark.sql(
        f"SELECT s.* FROM {view} d, "
        f"LATERAL {fn}(d.{id_col}, d.{text_col}) s"
    )
    # Materialization happens lazily after this returns; localCheckpoint
    # would defeat the laziness, so drop only the VIEW binding — the plan
    # already holds the resolved relation, and the registered UDTF stays
    # (harmless, name-spaced by the tag).
    spark.catalog.dropTempView(view)
    return out
