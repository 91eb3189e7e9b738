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
    the corpus vocabulary); doc length RIDES THROUGH the explode as a
    per-row size() column (r15 — the old keyed dl join re-tokenized the
    whole corpus for a value each matching doc already knows); doc
    frequency is a count window over the match-bounded tf table (r15 —
    the old aggregate-and-broadcast-back read tf twice, and column
    pruning rewrote the second copy's partial aggregate so the two tf
    exchanges never canonicalized equal: the corpus was tokenized once
    per copy). One corpus tokenize in the scoring plan, down from
    three. Per-(doc,term) contributions are rounded to 1e-6
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
    # two-step select: CollapseProject keeps the non-cheap tokens()
    # expression single-evaluation (size + explode both read _tk)
    pre = base.select(F.col(key_col), tokens(F.col(content_col)).alias("_tk"))
    toks = pre.select(
        F.col(key_col), F.size("_tk").alias("dl"), F.explode("_tk").alias("term")
    ).filter(F.col("term").isin([t.lower() for t in query_terms]))
    tf = toks.groupBy(key_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
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

    Cost is O(delta), in O(1) FILES — the Lucene-style segment shape:
    - postings: the delta's rows land as ONE parquet SEGMENT file under
      ``postings/_segments/`` carrying ``term_bucket`` as a column
      (the ``_``-prefixed dir is invisible to the base read; readers
      union it in explicitly, bucket-filtered — segments are
      delta-sized, so the unpruned-by-directory read is O(delta)).
    - dfreq: same — a one-file (term, df, term_bucket) segment under
      ``dfreq/_segments/``; readers SUM df across base + segments per
      term (df is an associative per-term count, split-safe).
    - stats: one-row add-and-rewrite of the mergeable counters, done
      DRIVER-SIDE via pyarrow (one row — a Spark job here is pure
      launch overhead).
    Periodically run :func:`compact_inverted_index` to fold
    accumulated segments back into the bucketed base dirs.

    Equivalence to a full rebuild is exact (tested bit-identical):
    every piece is an associative merge of per-document facts.

    Why segments and not in-place bucket maintenance (r9 verdict
    finding #2): the first cut of this path appended postings into
    their term_bucket dirs and dynamic-overwrote the affected dfreq
    buckets — ~10 Spark jobs and ~110 small parquet files per 100-doc
    append (a diverse delta touches most of the 64 buckets), costing
    MORE than a full sf0.1 rebuild (3.5 s vs 2.5 s, ~23 ms/file of
    writer+commit overhead). The segment shape runs THREE jobs writing
    THREE files: (1) the delta tf checkpoint, (2) the postings segment
    write (the doc-length stats aggregate rides it as an Observation),
    (3) the dfreq segment write. At 100 TB the same holds: append cost
    is delta-sized and file count is per-append constant, with
    compaction amortizing the bucket-dir rewrite across many appends.
    """
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import Observation

    from external_benchmarks_spark.functions.hashing import md5_hash32
    from external_benchmarks_spark.pipeline.layout import invalidate_layout

    # The index no longer matches any recorded source fingerprint: drop
    # the marker FIRST so a crash mid-append can never leave a layout
    # that ensure_inverted_index would reuse as "current" while its
    # postings/dfreq/stats include (or half-include) the delta.
    invalidate_layout(index_path)

    tf, dl = _tf_dl(new_docs, key_col, content_col)
    # tf feeds the postings segment AND the dfreq segment: checkpoint
    # once (also guards a non-deterministic upstream from disagreeing
    # between the two consumers). dl feeds only the postings join; its
    # stats aggregate rides the SAME job as an Observation.
    tf = tf.localCheckpoint(eager=True)
    obs_dl = Observation()
    dl = dl.observe(
        obs_dl,
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("bigint").alias("s"),
    )

    # Both segment files STAGE first into hidden ``.staging-<batch>``
    # dirs (invisible to readers), then publish as two renames sharing
    # the batch uuid. Crash windows: before the first publish — nothing
    # visible, the stale staging drops at the next compaction; between
    # the publishes — a postings segment without its dfreq twin, which
    # compact_inverted_index REPAIRS by deriving the twin from the
    # postings segment itself (df is a pure function of it); after both
    # but before stats — a retried batch re-publishes its rows (the
    # read path over-counts until compaction folds them away via
    # distinct; exactly-once callers gate on batch id, the
    # StreamingDeltaDedup contract).
    batch = uuid.uuid4().hex

    def _stage(df, piece: str) -> str:
        tmp = os.path.join(
            index_path, piece, "_segments", f".staging-{batch}"
        )
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        return tmp

    postings_seg = (
        tf.join(dl, key_col)
        .withColumn("term_bucket", md5_hash32(F.col("term")) % n_term_buckets)
        .select(key_col, "term", "tf", "dl", "term_bucket")
    )
    ptmp = _stage(postings_seg, "postings")
    delta_stats = obs_dl.get  # fired by the postings segment write
    dtmp = _stage(
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .withColumn(
            "term_bucket", md5_hash32(F.col("term")) % n_term_buckets
        ),
        "dfreq",
    )
    for piece, tmp in (("postings", ptmp), ("dfreq", dtmp)):
        part = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        os.replace(
            os.path.join(tmp, part),
            os.path.join(
                index_path, piece, "_segments", f"seg-{batch}.parquet"
            ),
        )
        shutil.rmtree(tmp, ignore_errors=True)

    # stats: ONE row of mergeable counters — read, add, atomically
    # republish driver-side (pipeline/layout.publish_parquet_atomic; a
    # Spark job for one row is pure launch overhead).
    from external_benchmarks_spark.pipeline.layout import (
        publish_parquet_atomic,
        recover_dir_swap,
    )

    stats_path = os.path.join(index_path, "stats")
    recover_dir_swap(stats_path)
    old_tbl = pq.read_table(stats_path)
    publish_parquet_atomic(
        stats_path,
        pa.table(
            {
                "n_docs": pa.array(
                    [
                        old_tbl.column("n_docs")[0].as_py()
                        + int(delta_stats["n"])
                    ],
                    pa.int64(),
                ),
                "sum_dl": pa.array(
                    [
                        old_tbl.column("sum_dl")[0].as_py()
                        + int(delta_stats["s"] or 0)
                    ],
                    pa.int64(),
                ),
            }
        ),
    )


def compact_inverted_index(
    spark,
    index_path: str,
    key_col: str = "doc_id",
    n_term_buckets: int = 64,
) -> list[int]:
    """Fold accumulated append segments back into the bucketed base
    dirs, restoring the pure partition-pruned read shape. Returns the
    compacted bucket ids ([] when there is nothing to do).

    Only the buckets any segment touches are rewritten: their base
    dirs ∪ the segments stage into ``_compact_staging`` and swap in
    with two renames per partition (the compact_layout_partitions
    commit device). IDEMPOTENT by construction, so a crashed run is
    simply re-run: postings merge with ``distinct()`` (a (doc, term)
    posting row is a fact — re-merging it is a no-op) and dfreq is
    RECOMPUTED per bucket from the compacted postings (df = posting
    count per term), never incrementally summed, so a half-published
    prior run can't double-count. Single-writer contract: like all the
    layout maintenance here, don't race readers — a reader between a
    swap and its segment delete can transiently double-count that
    piece."""
    import os
    import shutil

    from external_benchmarks_spark.functions.hashing import md5_hash32
    from external_benchmarks_spark.pipeline.layout import (
        recover_partition_swaps,
    )

    postings_path = os.path.join(index_path, "postings")
    dfreq_path = os.path.join(index_path, "dfreq")
    # Crash recovery first (pipeline/layout's shared two-rename rule),
    # plus: drop any hidden .staging-* dirs a crashed append left, and
    # REPAIR orphaned segments — a postings segment whose dfreq twin
    # never published (crash between the append's two publishes)
    # derives the twin from itself; a dfreq orphan (impossible under
    # the publish order, handled defensively) drops.
    for root in (postings_path, dfreq_path):
        recover_partition_swaps(root)
        seg_dir = os.path.join(root, "_segments")
        if os.path.isdir(seg_dir):
            for d in os.listdir(seg_dir):
                if d.startswith(".staging-"):
                    shutil.rmtree(os.path.join(seg_dir, d), ignore_errors=True)
    psegs = _segment_files(postings_path)
    dsegs = _segment_files(dfreq_path)
    pnames = {os.path.basename(f) for f in psegs}
    dnames = {os.path.basename(f) for f in dsegs}
    for name in sorted(dnames - pnames):
        os.remove(os.path.join(dfreq_path, "_segments", name))
    for name in sorted(pnames - dnames):
        seg = spark.read.parquet(
            os.path.join(postings_path, "_segments", name)
        )
        tmp = os.path.join(dfreq_path, "_segments", f".staging-repair")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            seg.groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
            .withColumn(
                "term_bucket",
                (md5_hash32(F.col("term")) % n_term_buckets).cast("int"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f
            for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        os.replace(
            os.path.join(tmp, part),
            os.path.join(dfreq_path, "_segments", name),
        )
        shutil.rmtree(tmp, ignore_errors=True)
    psegs = _segment_files(postings_path)
    dsegs = _segment_files(dfreq_path)
    if not psegs and not dsegs:
        return []
    affected = sorted(
        {
            int(r[0])
            for segs in (psegs, dsegs)
            if segs
            for r in spark.read.parquet(*segs)
            .select("term_bucket")
            .distinct()
            .collect()
        }
    )

    from external_benchmarks_spark.pipeline.layout import swap_partition_dir

    def _swap(root: str, staging: str) -> None:
        for b in affected:
            d = f"term_bucket={b}"
            staged = os.path.join(staging, d)
            if not os.path.isdir(staged):
                continue
            swap_partition_dir(root, d, staged)
        shutil.rmtree(staging, ignore_errors=True)

    # --- postings: base[affected] ∪ segments, exact-row distinct ---
    cols = [
        key_col,
        "term",
        "tf",
        "dl",
        F.col("term_bucket").cast("int").alias("term_bucket"),
    ]
    existing = [
        os.path.join(postings_path, f"term_bucket={b}")
        for b in affected
        if os.path.isdir(os.path.join(postings_path, f"term_bucket={b}"))
    ]
    parts = []
    if existing:
        parts.append(
            spark.read.option("basePath", postings_path)
            .parquet(*existing)
            .select(*cols)
        )
    if psegs:
        parts.append(
            spark.read.parquet(*psegs)
            .where(F.col("term_bucket").isin(affected))
            .select(*cols)
        )
    merged = parts[0]
    for fr in parts[1:]:
        merged = merged.unionByName(fr)
    merged = merged.distinct()
    staging_p = os.path.join(postings_path, "_compact_staging")
    shutil.rmtree(staging_p, ignore_errors=True)
    (
        merged.repartition(len(affected), F.col("term_bucket"))
        .sortWithinPartitions("term", key_col)
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(staging_p)
    )
    _swap(postings_path, staging_p)
    for f in psegs:
        os.remove(f)

    # --- dfreq: recomputed from the COMPACTED postings (idempotent) ---
    compacted = spark.read.option("basePath", postings_path).parquet(
        *(os.path.join(postings_path, f"term_bucket={b}") for b in affected)
    )
    staging_d = os.path.join(dfreq_path, "_compact_staging")
    shutil.rmtree(staging_d, ignore_errors=True)
    (
        compacted.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .withColumn(
            "term_bucket",
            (md5_hash32(F.col("term")) % n_term_buckets).cast("int"),
        )
        .repartition(len(affected), F.col("term_bucket"))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(staging_d)
    )
    _swap(dfreq_path, staging_d)
    for f in dsegs:
        os.remove(f)
    for root in (postings_path, dfreq_path):
        seg_dir = os.path.join(root, "_segments")
        if os.path.isdir(seg_dir) and not _segment_files(root):
            shutil.rmtree(seg_dir, ignore_errors=True)
    return affected


def _segment_files(piece_path: str) -> list[str]:
    """Parquet segment files under ``<piece>/_segments`` (the
    ``_``-prefixed dir is invisible to the base directory read, so
    segments are only seen by readers that union them in explicitly)."""
    import os

    seg = os.path.join(piece_path, "_segments")
    if not os.path.isdir(seg):
        return []
    return sorted(
        os.path.join(seg, f)
        for f in os.listdir(seg)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _read_index_piece(spark, piece_path: str, buckets: list[int]) -> DataFrame:
    """Bucket-filtered read of an index piece: the base directory scan
    (term_bucket is a partition dir — planning-time pruning) unioned
    with any append segments (term_bucket is a COLUMN there; segments
    are delta-sized, so the filter is a row-group predicate, which is
    the right price for data that hasn't been compacted yet)."""
    base = spark.read.parquet(piece_path).where(
        F.col("term_bucket").isin(buckets)
    )
    segs = _segment_files(piece_path)
    if not segs:
        return base
    cols = [
        c if c != "term_bucket" else F.col(c).cast("int").alias(c)
        for c in base.columns
    ]
    seg = spark.read.parquet(*segs).where(F.col("term_bucket").isin(buckets))
    return base.select(*cols).unionByName(seg.select(*cols))


def _read_index_stats(index_path: str) -> tuple[int, int]:
    """(n_docs, sum_dl) from the index's 1-row stats table, read
    DRIVER-SIDE with pyarrow (r16): the table is one row in one or two
    tiny files, and the previous ``spark.read.parquet(...).collect()``
    paid a full Spark job + file-listing round-trip (~0.2 s/call) per
    scorer invocation for a metadata lookup. O(#files) footer reads;
    same recovery semantics (caller runs recover_dir_swap first)."""
    import os

    import pyarrow.parquet as pq

    sdir = os.path.join(index_path, "stats")
    # same directory-read the append path's add-and-rewrite uses
    tbl = pq.read_table(sdir, columns=["n_docs", "sum_dl"])
    if tbl.num_rows != 1:
        raise ValueError(
            f"index stats at {sdir} has {tbl.num_rows} rows (expected 1)"
        )
    return int(tbl.column("n_docs")[0].as_py()), int(
        tbl.column("sum_dl")[0].as_py()
    )


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
    buckets (plus any uncompacted append segments, unioned in
    delta-sized); the only join is posting rows x a broadcast |q|-row
    dfreq slice — no corpus-sized join or explode at all."""
    import os

    from external_benchmarks_spark.pipeline.layout import recover_dir_swap

    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_term_bucket_py(t, n_term_buckets) for t in terms})
    recover_dir_swap(os.path.join(index_path, "stats"))
    n_docs, sum_dl = _read_index_stats(index_path)
    if n_docs == 0:
        return spark.createDataFrame([], f"{key_col} bigint, bm25 double")
    # Same float division bm25_topk performs driver-side.
    avgdl = float(sum_dl) / n_docs
    dfreq = (
        _read_index_piece(spark, os.path.join(index_path, "dfreq"), buckets)
        .where(F.col("term").isin(terms))
        # df is an associative per-term count: base + segments sum
        # exactly (a no-op |q|-row agg when the index is compacted)
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    p = (
        _read_index_piece(spark, os.path.join(index_path, "postings"), buckets)
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


def bm25_batch_from_index(
    spark,
    index_path: str,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    key_col: str = "doc_id",
    n_term_buckets: int = 64,
) -> DataFrame:
    """:func:`bm25_batch` off the materialized postings (r16): every
    query scored from ONE partition-pruned postings read — no corpus
    tokenize at all. Score path: postings rows for the union of query
    terms x a broadcast |q|-row dfreq slice x a broadcast (query, term)
    table, then the same :func:`bm25_contrib_fp` fixed-point sum and
    per-query rank window over the match-bounded scored set.

    Bit-identical to ``bm25_batch`` by composition: ``bm25_from_index``
    ≡ ``bm25_topk`` per query (tested), and ``bm25_batch`` ≡
    ``bm25_topk`` per query (tested) — all three build the score from
    the one ``bm25_contrib_fp`` expression over the same (tf, df, dl)
    values. Output: (query_id, doc_id, bm25, rank <= k)."""
    import os

    from external_benchmarks_spark.pipeline.layout import recover_dir_swap

    qt_rows = sorted(
        {(int(qid), t.lower()) for qid, terms in queries.items() for t in terms}
    )
    all_terms = sorted({t for _, t in qt_rows})
    buckets = sorted({_term_bucket_py(t, n_term_buckets) for t in all_terms})
    recover_dir_swap(os.path.join(index_path, "stats"))
    n_docs, sum_dl = _read_index_stats(index_path)
    if n_docs == 0:
        return spark.createDataFrame(
            [], f"query_id bigint, {key_col} bigint, bm25 double, rank bigint"
        )
    avgdl = float(sum_dl) / n_docs
    dfreq = (
        _read_index_piece(spark, os.path.join(index_path, "dfreq"), buckets)
        .where(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    qt = spark.createDataFrame(qt_rows, "query_id bigint, term string")
    p = (
        _read_index_piece(spark, os.path.join(index_path, "postings"), buckets)
        .where(F.col("term").isin(all_terms))
        .join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
    )
    fp = bm25_contrib_fp(n_docs, avgdl, k1, b)
    per_doc = (
        p.select("query_id", F.col(key_col), fp.alias("fp"))
        .groupBy("query_id", key_col)
        .agg(F.sum("fp").alias("score_fp"))
        .select(
            "query_id",
            key_col,
            (F.col("score_fp").cast("double") / 1_000_000.0).alias("bm25"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc(key_col))
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", key_col, "bm25", "rank")
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
    # same r15 single-pass shape as bm25_topk: dl rides through the
    # explode (no corpus-sized keyed join), df is a count window over
    # the match-bounded tf (no second tf read whose pruned partial
    # aggregate defeats exchange reuse) — one corpus tokenize in the
    # scoring plan, down from three.
    pre = base.select(F.col(key_col), tokens(F.col(content_col)).alias("_tk"))
    toks = pre.select(
        F.col(key_col), F.size("_tk").alias("dl"), F.explode("_tk").alias("term")
    ).filter(F.col("term").isin(all_terms))
    tf = toks.groupBy(key_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).join(F.broadcast(qt), "term")
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
