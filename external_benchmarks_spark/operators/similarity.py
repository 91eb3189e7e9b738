"""Similarity search over embedding columns.

Three tiers (SURVEY.md §7.5 — Spark has no native ANN):

- ``bruteforce_topk``   : exact cosine/dot top-k. The correctness oracle
                          (reference README.md:76 measures recall against
                          exact search) and perfectly scalable: score is a
                          map-only pass, top-k is TakeOrderedAndProject.
- ``lsh_bucketed_topk`` : random-hyperplane LSH pre-filter — score only
                          rows whose sign-bucket matches the query's in
                          >= ``min_matching_bits`` of ``n_planes`` bits.
                          The scale path: at 100 TB the bucket id is a
                          partition column, so a query touches only its
                          bucket's partitions. Recall is measured against
                          bruteforce via operators.topk.recall_at_k.
- ``ivf_*``             : inverted-file index — distributed MLlib KMeans
                          centroids, every row assigned to its nearest
                          centroid (one Arrow matmul pass), queries probe
                          only the ``nprobe`` nearest centroid cells.
                          Unlike sign-LSH, IVF adapts to the data's
                          cluster structure, so it prunes well even when
                          uniform-random vectors defeat hyperplane LSH.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from external_benchmarks_spark.functions.vector import (
    cosine_similarity_literal,
    dot_product,
    dot_product_literal,
    l2_norm,
)


def bruteforce_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    metric: str = "cosine",
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """Exact top-k by cosine (or dot) against a fixed query vector.

    Default is the Catalyst HOF form (oracle-parity bit-exactness); the
    Arrow fast path scores each batch with one BLAS matmul — same
    ranking, last-ulp score differences possible (functions/vector.py).
    """
    if use_arrow_fast_path:
        from external_benchmarks_spark.functions.vector import score_batch_udf

        score = score_batch_udf(qvec, normalize=(metric == "cosine"))(F.col(emb_col))
    elif metric == "cosine":
        score = cosine_similarity_literal(emb_col, qvec)
    else:
        score = dot_product_literal(emb_col, qvec)
    return (
        df.select(F.col(key_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(key_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket_udf(planes: np.ndarray):
    """Sign-bit bucket id of an embedding column: bit i = dot(emb, plane_i) > 0.

    Arrow-batched numpy: one (batch x dim) @ (dim x planes) matmul per
    batch. A pure-Catalyst unrolled form was tried and rejected — at
    64 dims x 8 planes the generated Java method exceeds janino limits and
    falls back to interpreted eval (slower than the Arrow hop).
    """
    mat = np.ascontiguousarray(planes.T, dtype=np.float64)  # (dim, n_planes)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @F.pandas_udf(LongType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
        bits = (m @ mat) > 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    min_matching_bits: int = 3,
    seed: int = 42,
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """ANN: score only rows whose LSH bucket is Hamming-close to the query's.

    With ``min_matching_bits == n_planes`` this scans one bucket (fastest,
    lowest recall); lowering it widens the probe (multi-probe LSH).
    Measured on the synthetic UNIFORM random vectors, recall>=0.9 needs a
    wide probe (>=3 of 8 bits, ~80% scanned) — uniform data is LSH's
    worst case; clustered real-world embeddings prune far better. The
    recall/speed trade-off is asserted in tests/test_similarity.py per the
    reference's >90% recall requirement (README.md:76), at BOTH the
    testdata's 64 dims and the reference's production 2,688.

    ``use_arrow_fast_path`` is REQUIRED beyond ~1k dims: the
    oracle-parity scorer unrolls one expression term per dimension and
    a 2,688-term tree overflows the JVM analyzer stack; the Arrow
    scorer is one BLAS matvec per batch at any width.
    """
    planes = hyperplanes(len(qvec), n_planes, seed)
    qbucket = sum(
        (1 << i) for i, plane in enumerate(planes) if float(np.dot(plane, qvec)) > 0
    )
    bucket = lsh_bucket_udf(planes)(F.col(emb_col))
    # popcount(bucket XOR qbucket) over n_planes bits — small expression,
    # stays in codegen (the heavy dot products live in the Arrow batch).
    x = bucket.bitwiseXOR(F.lit(qbucket).cast("bigint"))
    pop = sum((F.shiftright(x, i) % 2).cast("int") for i in range(n_planes))
    cand = df.filter(pop <= (n_planes - min_matching_bits))
    return bruteforce_topk(
        cand, qvec, k, key_col, emb_col, metric="cosine",
        use_arrow_fast_path=use_arrow_fast_path,
    )


def ivf_fit(
    df: DataFrame,
    n_centroids: int = 16,
    emb_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    metric: str = "cosine",
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Fit IVF centroids with distributed MLlib KMeans.

    ``sample_fraction`` fits on a seeded uniform sample — the 100 TB
    path: Lloyd iterations over (say) 0.1% of 10^10 rows recover the
    same cell structure at 1000x less cost, and ONLY the assignment
    pass (one Arrow matmul scan) touches every row.

    ``metric="cosine"`` fits *spherical* k-means (rows L2-normalized
    first) so cell geometry matches cosine ranking — Euclidean-nearest on
    the unit sphere is cosine-nearest. The fit is the scalable path
    (Lloyd iterations are map-reduce passes over the executors; nothing
    but (k x dim) centroids ever reaches the driver). Returns the
    (n_centroids x dim) matrix — small enough to broadcast into the
    assignment/probe steps.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import Normalizer
    from pyspark.ml.functions import array_to_vector

    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    feats = df.select(array_to_vector(F.col(emb_col).cast("array<double>")).alias("_raw"))
    if metric == "cosine":
        feats = Normalizer(inputCol="_raw", outputCol="features", p=2.0).transform(feats)
    else:
        feats = feats.withColumnRenamed("_raw", "features")
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    return np.vstack([np.asarray(c, dtype=np.float64) for c in model.clusterCenters()])


def sampled_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    normalize: bool = True,
) -> np.ndarray:
    """Deterministic IVF centroids WITHOUT Lloyd iterations: the rows that
    sort first by ``md5(key)`` — a seeded-hash uniform sample that any SQL
    engine reproduces exactly (``ORDER BY md5(CAST(key AS VARCHAR)), key
    LIMIT n``), which makes the whole IVF pipeline (assign → probe → top-k)
    independently auditable by an external oracle. Trades a few recall
    points vs the adaptive ``ivf_fit`` KMeans centroids; use that fit for
    production recall, this one when the index must be engine-portable.
    Only (n_centroids × dim) doubles reach the driver.

    Scale shape: ``orderBy(md5).limit(n)`` plans as
    **TakeOrderedAndProject** — per-partition top-n heaps + one driver
    merge of n×partitions rows, NOT a global sort-shuffle (plan-asserted
    in tests/test_plans.py). The md5 evaluation is one codegen'd pass
    over the scan; at 100 TB this is a map-only job whose driver traffic
    is n rows per partition."""
    rows = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(emb_col).cast("array<double>").alias("e"),
        )
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .limit(n_centroids)
        .collect()
    )
    mat = np.vstack([np.asarray(r["e"], dtype=np.float64) for r in rows])
    if normalize:
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(n == 0.0, 1.0, n)
    return mat


def ivf_assign_udf(centroids: np.ndarray, metric: str = "cosine"):
    """Nearest-centroid id — one Arrow-batched matmul.

    argmin ||x - c||^2 == argmin (||c||^2 - 2 x.c): one (batch x dim) @
    (dim x k) product plus a precomputed norm row; no per-row Python.
    For cosine, rows are unit-normalized first (centroids already come
    from the spherical fit).
    """
    cmat = np.ascontiguousarray(centroids.T, dtype=np.float64)  # (dim, k)
    cnorm2 = (centroids * centroids).sum(axis=1)  # (k,)
    spherical = metric == "cosine"

    @F.pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
        if spherical:
            n = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(n == 0.0, 1.0, n)
        d = cnorm2 - 2.0 * (m @ cmat)  # (batch, k), up to the x-norm constant
        return pd.Series(np.argmin(d, axis=1).astype(np.int64))

    return assign


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Add ``centroid_id`` — the IVF cell / partition key. Written as a
    partition column (pipeline/index.build_index_layout), equality filters
    on it prune whole directories, so a probe reads nprobe/k of the data."""
    return df.withColumn(
        "centroid_id", ivf_assign_udf(centroids, metric)(F.col(emb_col))
    )


def ivf_probe_cells(
    centroids: np.ndarray,
    qvec: Sequence[float],
    nprobe: int,
    metric: str = "cosine",
) -> list[int]:
    """The nprobe nearest centroid ids for a query — driver-side on the
    tiny (k x dim) matrix, becomes an isin() partition-pruning filter."""
    q = np.asarray(qvec, dtype=np.float64)
    if metric == "cosine":
        n = float(np.linalg.norm(q))
        q = q / (n if n else 1.0)
    d = ((centroids - q) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    metric: str = "cosine",
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """ANN top-k probing only the ``nprobe`` nearest IVF cells.

    ``assigned`` must carry ``centroid_id`` (ivf_assign, or read back from
    the centroid-partitioned layout where the isin() prunes directories).
    Exact scoring inside the probed cells; recall vs bruteforce_topk is
    asserted >= 0.9 in tests/test_similarity.py (reference README.md:76).
    On the synthetic UNIFORM vectors (IVF's worst case — neighbors spread
    almost isotropically in high dim) hitting 0.9 needs a wide probe
    (~10-12 of 16 cells); clustered real-world embeddings prune far
    better. Even so IVF beats sign-LSH here: the spherical fit adapts to
    the data, where fixed random hyperplanes cannot.
    """
    cells = ivf_probe_cells(centroids, qvec, nprobe, metric)
    cand = assigned.filter(F.col("centroid_id").isin(cells))
    return bruteforce_topk(
        cand, qvec, k, key_col, emb_col, metric=metric,
        use_arrow_fast_path=use_arrow_fast_path,
    )


def per_query_ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 100,
    nprobe: int = 4,
    item_key: str = "vec_id",
    emb_col: str = "embedding",
    query_key: str = "query_id",
    query_emb: str = "qvec",
    metric: str = "cosine",
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """Batch-of-queries ANN through the IVF index.

    Each query considers ONLY items in its nprobe nearest cells; probe
    geometry is always the spherical (cosine) cell space, ``metric``
    selects the scoring function. Output schema matches
    operators/topk.per_query_topk (query_id, item, score, rank) — recall
    vs that exact oracle is asserted in tests/test_similarity.py.

    Exact path: broadcast (query, cell) pairs join the items, per-pair
    Catalyst dot — bit-exact scores.
    Arrow path (the 100 TB shape): scan is PRUNED to the union of probed
    cells (a partition filter on the IVF layout), each Arrow batch scores
    with ONE BLAS matmul against all queries, and a (cell x query)
    boolean mask invalidates pairs outside a query's probe set before the
    batch-local top-k — BLAS throughput AND per-query cell semantics.
    """
    from pyspark.sql.window import Window

    from external_benchmarks_spark.functions.vector import (
        cosine_similarity,
        dot_product,
    )

    spark = assigned.sparkSession
    qrows = queries.select(query_key, query_emb).collect()  # small by contract
    probes = {
        int(r[0]): ivf_probe_cells(centroids, r[1], nprobe, "cosine") for r in qrows
    }
    cells_union = sorted({c for cells in probes.values() for c in cells})

    if use_arrow_fast_path:
        return _per_query_ivf_arrow(
            assigned.filter(F.col("centroid_id").isin(cells_union)),
            qrows, probes, centroids.shape[0], k,
            item_key, emb_col, query_key, metric,
        )

    probe_pairs = [(q, c) for q, cells in probes.items() for c in cells]
    probe_df = spark.createDataFrame(probe_pairs, [query_key, "centroid_id"])
    cand = assigned.join(F.broadcast(probe_df), "centroid_id").join(
        F.broadcast(queries), query_key
    )
    score = (
        cosine_similarity(emb_col, query_emb)
        if metric == "cosine"
        else dot_product(emb_col, query_emb)
    )
    w = Window.partitionBy(query_key).orderBy(F.desc("score"), F.asc(item_key))
    return (
        cand.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, item_key, "score", "rank")
    )


def _per_query_ivf_arrow(
    cand: DataFrame,
    qrows,
    probes: dict[int, list[int]],
    n_cells: int,
    k: int,
    item_key: str,
    emb_col: str,
    query_key: str,
    metric: str,
) -> DataFrame:
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    qmat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows]).T  # (dim, Q)
    if metric == "cosine":
        qmat = qmat / np.linalg.norm(qmat, axis=0, keepdims=True)
    valid = np.zeros((n_cells, len(qids)), dtype=bool)  # (cell, query)
    for j, qid in enumerate(qids):
        valid[probes[int(qid)], j] = True

    out_schema = StructType(
        [
            StructField(query_key, LongType()),
            StructField(item_key, LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def local_topk(batches):
        for pdf in batches:
            keys = pdf[item_key].to_numpy()
            cells = pdf["centroid_id"].to_numpy().astype(np.int64)
            m = np.vstack(pdf[emb_col].to_numpy()).astype(np.float64, copy=False)
            scores = m @ qmat  # (B, Q) — one BLAS call
            if metric == "cosine":
                norms = np.linalg.norm(m, axis=1, keepdims=True)
                norms[norms == 0.0] = 1.0
                scores = scores / norms
            scores = np.where(valid[cells], scores, -np.inf)  # cell mask
            kk = min(k, len(keys))
            idx = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, Q)
            top = np.take_along_axis(scores, idx, axis=0)  # (kk, Q)
            keep = np.isfinite(top.T.ravel())
            recs = {
                query_key: np.repeat(qids, kk)[keep],
                item_key: keys[idx].T.ravel()[keep],
                "score": top.T.ravel()[keep],
            }
            yield pd.DataFrame(recs)

    survivors = cand.select(item_key, "centroid_id", emb_col).mapInPandas(
        local_topk, out_schema
    )
    w = Window.partitionBy(query_key).orderBy(F.desc("score"), F.asc(item_key))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key, item_key, "score", "rank")
    )


def pairwise_cosine_stats(
    df: DataFrame,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_n: int = 200,
) -> DataFrame:
    """Distribution of pairwise cosine sims on a bounded sample.

    Reference scripts/generate_benchmark_reports.py:527-539 computes an
    n<=200 pairwise cosine matrix and keeps the upper triangle; here the
    sample is taken distributed, the pair join is a broadcast self-join,
    and only moments come back.
    """
    sample = df.select(key_col, emb_col).limit(sample_n)
    a = sample.select(F.col(key_col).alias("id_a"), F.col(emb_col).alias("ea"))
    b = sample.select(F.col(key_col).alias("id_b"), F.col(emb_col).alias("eb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    from external_benchmarks_spark.functions.vector import cosine_similarity

    cos = cosine_similarity("ea", "eb")
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(cos), 6).alias("mean_cos"),
        F.round(F.stddev_samp(cos), 6).alias("std_cos"),
        F.round(F.min(cos), 6).alias("min_cos"),
        F.round(F.max(cos), 6).alias("max_cos"),
    )


def cluster_profile(
    assigned: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """Exact per-cluster geometry after centroid assignment — the audit
    step of corpus clustering (cluster-then-sample curation pipelines need
    cluster sizes and cohesion before deciding per-cluster quotas).

    Returns (cluster_id, n_members, cohesion_fp, min_cos_fp, avg_cos):
    per-member cosine to the OWN cluster's centroid is rounded to 1e-6
    fixed-point (one ln-free libm-safe op chain: HOF dot product +
    sqrt, bit-identical in DuckDB per functions/vector.dot_product), then
    summed / min'd as integers — order-independent across partitions.
    avg_cos derives from the exact integer sum, so the whole row
    hash-matches an independent SQL replication.

    Scale shape: the (k x dim) centroid matrix is a BROADCAST side table
    equi-joined on cluster_id — at realistic clustering scale (k=4096,
    dim=768 ~ 25 MB) a plan-literal array would bloat every task's
    serialized plan and Catalyst analysis, while a broadcast ships once
    per executor. One groupBy on k keys after the join (map-side partials
    collapse every partition to <= k rows before the shuffle).
    """
    return (
        centroid_cosine_fp(assigned, centroids, emb_col=emb_col, cluster_col=cluster_col)
        .select("cluster_id", "cos_fp")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("cos_fp").alias("cohesion_fp"),
            F.min("cos_fp").alias("min_cos_fp"),
        )
        .select(
            "cluster_id",
            "n_members",
            "cohesion_fp",
            "min_cos_fp",
            (
                F.col("cohesion_fp").cast("double")
                / (F.col("n_members") * 1_000_000).cast("double")
            ).alias("avg_cos"),
        )
    )


def centroid_cosine_fp(
    assigned: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """(key, cluster_id, cos_fp): each row's cosine to its OWN cluster's
    centroid, rounded to 1e-6 fixed point — the shared per-row kernel of
    cluster_profile (aggregate audit) and semdedup (per-row keep rule).
    Centroids ride as a broadcast side table equi-joined on cluster_id;
    the op chain (HOF dot + sqrt) is bit-identical in DuckDB."""
    spark = assigned.sparkSession
    cent_rows = [
        (int(i), [float(v) for v in row])
        for i, row in enumerate(np.asarray(centroids, dtype=np.float64))
    ]
    # Arrow path: a pandas-backed createDataFrame plans as a JVM-local
    # LocalTableScan, so evaluating the broadcast side touches no Python
    # workers (a plain createDataFrame parallelizes pickled slices — each
    # pays a Python-worker round-trip; see streaming/upsert.py:202).
    try:
        cent_df = spark.createDataFrame(
            pd.DataFrame(cent_rows, columns=["cluster_id", "_centroid"]),
            schema="cluster_id bigint, _centroid array<double>",
        )
    except Exception:
        cent_df = spark.createDataFrame(
            cent_rows, schema="cluster_id bigint, _centroid array<double>"
        )
    e = F.col(emb_col).cast("array<double>")
    cv = F.col("_centroid")
    norm = l2_norm(e)
    cos = F.when(norm > 0.0, dot_product(e, cv) / norm).otherwise(F.lit(0.0))
    cos_fp = F.round(cos * 1_000_000, 0).cast("bigint")
    return (
        assigned.select(
            F.col(key_col),
            F.col(cluster_col).cast("bigint").alias("cluster_id"),
            F.col(emb_col),
        )
        .join(F.broadcast(cent_df), "cluster_id")
        .select(F.col(key_col), F.col("cluster_id"), cos_fp.alias("cos_fp"))
    )


def semdedup(
    assigned: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.2,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str = "centroid_id",
    use_arrow_fast_path: bool = False,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Semantic deduplication (Abbas et al. 2023, "SemDeDup"): within each
    cluster, find pairs with cosine >= threshold and keep only the member
    FARTHEST from the centroid in each duplicate neighborhood — the
    published keep-low-centroid-similarity rule, made deterministic by
    tie-breaking on the key. Returns the surviving (key, cluster_id).

    Shape: the pairwise check is BLOCKED by cluster (operators/dedup.
    embedding_neardup_pairs — never an all-pairs join); the keep rule is
    one symmetric join against the per-row centroid-cosine table and a
    left-anti join back. All joins keyed; oracle replays the identical
    arithmetic (deterministic sampled centroids + fixed-point cosines).
    """
    from external_benchmarks_spark.operators.dedup import embedding_neardup_pairs

    if use_arrow_fast_path:
        return _semdedup_arrow(
            assigned, centroids, threshold, key_col, emb_col, cluster_col,
            max_block_rows,
        )
    percos = centroid_cosine_fp(
        assigned, centroids, key_col=key_col, emb_col=emb_col, cluster_col=cluster_col
    )
    pairs = embedding_neardup_pairs(
        assigned,
        block_col=cluster_col,
        key_col=key_col,
        emb_col=emb_col,
        threshold=threshold,
        use_arrow_fast_path=use_arrow_fast_path,
        max_block_rows=max_block_rows,
    ).select("id_a", "id_b")
    sym = pairs.union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
    pa = percos.select(
        F.col(key_col).alias("id_a"), F.col("cos_fp").alias("_fp_a")
    )
    pb = percos.select(
        F.col(key_col).alias("id_b"), F.col("cos_fp").alias("_fp_b")
    )
    # drop a row iff some tau-neighbor sits strictly closer to "keep":
    # smaller (cos_fp, key) — i.e. the neighborhood's minimum survives.
    dropped = (
        sym.join(pa, "id_a")
        .join(pb, "id_b")
        .filter(
            (F.col("_fp_b") < F.col("_fp_a"))
            | ((F.col("_fp_b") == F.col("_fp_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias(key_col))
        .distinct()
    )
    return percos.join(dropped, key_col, "left_anti").select(key_col, "cluster_id")


def _semdedup_arrow(
    assigned: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    key_col: str,
    emb_col: str,
    cluster_col: str,
    max_block_rows: int | None,
) -> DataFrame:
    """SemDeDup fast path: the whole per-cluster computation — pairwise
    Gram matmul, per-row centroid cosine, and the keep-farthest rule — in
    ONE applyInPandas over the cluster blocks, followed by a single
    anti-join. Eliminates the three percos scans and two pair joins of
    the declarative form (the oracle-parity HOF form keeps that shape).

    Bit-parity with the HOF form is preserved at every decision boundary:
    - pair threshold: BLAS cosines within 1e-9 of the threshold are
      re-scored with the exact left-to-right fold;
    - fixed-point centroid cosine: values within 1e-6 of a .5 rounding
      boundary are re-derived with the fold and rounded exactly as
      Spark's ``round`` does (BigDecimal.valueOf HALF_UP ==
      ``Decimal(repr(v))`` HALF_UP).
    Outside those bands the float64 arithmetics agree by a >1e-9 margin.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from external_benchmarks_spark.operators.dedup import _subblock_key

    cmat = np.asarray(centroids, dtype=np.float64)

    def _fold_dot(u: np.ndarray, v: np.ndarray) -> float:
        acc = 0.0
        for x, y in zip(u.tolist(), v.tolist()):
            acc += x * y
        return acc

    def _fold_norm(u: np.ndarray) -> float:
        acc = 0.0
        for x in u.tolist():
            acc += x * x
        return math.sqrt(acc)

    def _spark_round_fp(v: float) -> int:
        return int(Decimal(repr(v)).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    def drop_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"_drop_id": pd.Series(dtype="int64")})
        if n < 2:
            return empty
        order = np.argsort(pdf[key_col].to_numpy(), kind="stable")
        ids = pdf[key_col].to_numpy()[order].astype(np.int64)
        cid = int(pdf[cluster_col].iloc[0])
        m = np.vstack(pdf[emb_col].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        safe = np.where(norms == 0.0, 1.0, norms)
        # per-row centroid cosine -> 1e-6 fixed point (HOF: dot/row_norm,
        # 0.0 for zero-norm rows; centroids arrive unit-normalized)
        v = np.where(norms == 0.0, 0.0, (m @ cmat[cid]) / safe) * 1_000_000.0
        fp = np.where(v >= 0.0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)
        near = np.abs(np.abs(v) % 1.0 - 0.5) <= 1e-6
        for i in np.nonzero(near)[0].tolist():
            nf = _fold_norm(m[i])
            cosf = _fold_dot(m[i], cmat[cid]) / nf if nf > 0.0 else 0.0
            fp[i] = _spark_round_fp(cosf * 1_000_000.0)
        # pairwise cosines; drop the (fp, id)-larger endpoint of each pair
        cos = (m @ m.T) / (safe[:, None] * safe[None, :])
        cos[norms == 0.0, :] = np.nan
        cos[:, norms == 0.0] = np.nan
        ri, cj = np.nonzero(cos >= threshold - 1e-9)
        dropped: set[int] = set()
        for i, j in zip(ri.tolist(), cj.tolist()):
            if j <= i:
                continue
            c = float(cos[i, j])
            if abs(c - threshold) <= 1e-9:
                na, nb = _fold_norm(m[i]), _fold_norm(m[j])
                denom = na * nb
                c = _fold_dot(m[i], m[j]) / denom if denom != 0.0 else float("nan")
                if not (c >= threshold):
                    continue
            # drop the neighborhood's (fp, id)-maximum endpoint
            loser = j if (fp[j], ids[j]) > (fp[i], ids[i]) else i
            dropped.add(int(ids[loser]))
        if not dropped:
            return empty
        return pd.DataFrame({"_drop_id": np.array(sorted(dropped), dtype=np.int64)})

    if max_block_rows is not None:
        blocked = _subblock_key(assigned, cluster_col, emb_col, max_block_rows, key_col)
    else:
        blocked = assigned.withColumn("_blk", F.col(cluster_col))
    dropped = (
        blocked.select(F.col(key_col), F.col("_blk"), F.col(cluster_col), F.col(emb_col))
        .groupBy("_blk")
        .applyInPandas(drop_block, "_drop_id bigint")
        .select(F.col("_drop_id").alias(key_col))
        .distinct()
    )
    return (
        assigned.select(
            F.col(key_col), F.col(cluster_col).cast("bigint").alias("cluster_id")
        )
        .join(dropped, key_col, "left_anti")
        .select(key_col, "cluster_id")
    )


def cluster_representatives(
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """Top-k most-central members per cluster — the prototype-selection
    primitive of cluster-then-curate pipelines (label the k nearest to
    each centroid, audit a cluster by its exemplars). One window over the
    per-row centroid-cosine table; ties broken by key. Shuffle: the
    single window partition-by (cluster_id) — k x n_clusters rows out."""
    from pyspark.sql.window import Window

    pc = centroid_cosine_fp(
        assigned, centroids, key_col=key_col, emb_col=emb_col, cluster_col=cluster_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cos_fp"), F.asc(key_col)
    )
    return (
        pc.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select(key_col, "cluster_id", "cos_fp", "rn")
    )

def maxsim_topk(
    df: DataFrame,
    query_tokens: Sequence[Sequence[float]],
    k: int = 20,
    n_chunks: int = 8,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """ColBERT-style late-interaction MaxSim retrieval (Khattab &
    Zaharia, SIGIR 2020): a document is a BAG of token vectors and
    score(q, d) = sum over query tokens of max over doc tokens of the
    dot product — finer-grained than single-vector retrieval because
    each query token independently aligns to its best document token.

    Document token vectors are the ``n_chunks`` contiguous slices of the
    stored embedding (the packed multi-vector layout: one fixed-width
    array column instead of an exploded token table — at 100 TB the
    explode would multiply row count by tokens-per-doc and shuffle it;
    the packed form keeps MaxSim a map-only scan feeding a
    TakeOrderedAndProject top-k).

    Two tiers like bruteforce_topk: the default pure-Catalyst form
    (slice -> zip_with product -> aggregate fold per chunk dot,
    greatest() across chunks per query token, per-token 1e-6
    fixed-point rounding summed as BIGINT — partition-order-independent
    and replayable by a SQL oracle) and an Arrow fast path
    (``use_arrow_fast_path``) that scores each batch with ONE einsum
    over the (batch, chunks, width) tensor — the production form at the
    reference's 2,688-dim width, where a per-row HOF fold is 10-100x
    slower. Same ranking; last-ulp score differences possible
    (rank-parity-tested in tests/test_similarity.py).
    """
    width = len(query_tokens[0])
    for qt in query_tokens:
        if len(qt) != width:
            raise ValueError("query tokens must share one width")
    # Both tiers fail loudly on a width mismatch instead of silently
    # scoring partial chunks: slicing past the array end would null-pad
    # (Catalyst) or mis-reshape (Arrow). assert_true is a per-row
    # comparison, negligible next to the dot products.
    need = n_chunks * width
    df = df.filter(
        F.assert_true(
            F.size(F.col(emb_col)) == need,
            F.lit(f"maxsim_topk: embedding length != n_chunks*width={need}"),
        ).isNull()
    )
    if use_arrow_fast_path:
        from pyspark.sql.types import DoubleType

        q = np.asarray(query_tokens, dtype=np.float64)  # (tokens, width)

        @F.pandas_udf(DoubleType())
        def _maxsim(emb: pd.Series) -> pd.Series:
            m = np.vstack(emb.to_numpy()).astype(np.float64, copy=False)
            b = m.reshape(len(m), n_chunks, -1)  # (batch, chunks, width)
            sims = np.einsum("bcw,tw->bct", b, q)
            return pd.Series(sims.max(axis=1).sum(axis=1))

        return (
            df.select(
                F.col(key_col), _maxsim(F.col(emb_col)).alias("maxsim")
            )
            .orderBy(F.desc("maxsim"), F.asc(key_col))
            .limit(k)
        )
    e = F.col(emb_col).cast("array<double>")
    token_maxes = []
    for qt in query_tokens:
        qlit = F.lit([float(x) for x in qt])  # one py4j call, not dim
        chunk_dots = [
            F.aggregate(
                F.zip_with(
                    F.slice(e, ci * width + 1, width), qlit, lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for ci in range(n_chunks)
        ]
        token_maxes.append(
            F.greatest(*chunk_dots) if len(chunk_dots) > 1 else chunk_dots[0]
        )
    total_fp = None
    for tm in token_maxes:
        fp = F.round(tm * 1_000_000.0, 0).cast("bigint")
        total_fp = fp if total_fp is None else total_fp + fp
    return (
        df.select(
            F.col(key_col),
            (total_fp.cast("double") / 1_000_000.0).alias("maxsim"),
        )
        .orderBy(F.desc("maxsim"), F.asc(key_col))
        .limit(k)
    )

def mmr_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    m: int = 50,
    lam: float = 0.7,
    key_col: str = "vec_id",
    emb_col: str = "embedding",
    use_arrow_fast_path: bool = False,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein, SIGIR 1998): greedily pick argmax of
    ``lam * relevance - (1 - lam) * max cosine-sim to already-selected``
    — the standard de-redundancy re-rank for retrieval and for
    diversity-aware training-data selection.

    Two stages. Stage 1 is the corpus-sized, distributed part: top-m
    candidates by cosine relevance (TakeOrderedAndProject — per-partition
    heaps, no global sort). Stage 2 is the inherently sequential greedy
    over m rows, run driver-side — m is small BY CONTRACT (the re-rank
    window, like the pairwise-cosine <= 200 pattern), so this collect is
    O(m * dim) bytes regardless of corpus size; the greedy is O(k * m)
    fold dot products.

    Oracle parity: relevance comes from the Catalyst HOF cosine
    (left-to-right fold = DuckDB list_dot_product); driver arithmetic
    uses the same sequential folds, and every greedy comparison happens
    on half-away-from-zero 1e-6 fixed-point integers, so the selection
    replays DuckDB's recursive-CTE greedy bit-for-bit.

    ``use_arrow_fast_path`` switches the driver greedy's pair dots to
    one numpy gemv per step (and the normalization to BLAS) — the
    production form at high dims, where a Python fold over 2,688
    elements x m candidates per step is the bottleneck. Same selection
    in practice (differences live below the 1e-6 rounding); the fold
    form remains the oracle-parity tier.
    """
    import math

    from external_benchmarks_spark.functions.vector import (
        cosine_similarity_literal,
    )

    if use_arrow_fast_path:
        # HOF cosine unrolls one expression term per dimension and
        # overflows the JVM analyzer beyond ~1k dims (the
        # lsh_bucketed_topk caveat); the Arrow scorer is one BLAS
        # matvec per batch at any width.
        from external_benchmarks_spark.functions.vector import score_batch_udf

        rel_col = score_batch_udf(qvec, normalize=True)(F.col(emb_col))
    else:
        rel_col = cosine_similarity_literal(emb_col, qvec)
    cand = (
        df.select(
            F.col(key_col),
            F.col(emb_col).cast("array<double>").alias("e"),
            rel_col.alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc(key_col))
        .limit(m)
    )
    rows = cand.collect()  # m rows by contract

    def fold_dot(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc += x * y
        return acc

    def fp(x: float) -> int:
        # half away from zero on the exact double, no +0.5 drift
        y = x * 1_000_000.0
        f = math.floor(abs(y))
        r = f + 1 if abs(y) - f >= 0.5 else f
        return int(math.copysign(r, y)) if y != 0.0 else 0

    ids = [r[0] for r in rows]
    rels = [float(r["rel"]) for r in rows]
    if use_arrow_fast_path and rows:
        mat = np.asarray([[float(x) for x in r["e"]] for r in rows])
        norms = np.linalg.norm(mat, axis=1)
        mat = mat / np.where(norms == 0.0, 1.0, norms)[:, None]
        sim = mat @ mat.T  # (m, m) once; each step reads a row slice

        def pair_sim(i: int, j: int) -> float:
            return float(sim[i, j])
    else:
        ens = []
        for r in rows:
            e = [float(x) for x in r["e"]]
            n = math.sqrt(fold_dot(e, e))
            ens.append([x / n for x in e] if n else e)

        def pair_sim(i: int, j: int) -> float:
            return fold_dot(ens[i], ens[j])

    if not rows or k <= 0:
        out_rows = []
    else:
        # step 1: rows arrive sorted by (rel desc, id) — first wins
        out_rows = [(1, ids[0], fp(rels[0]))]
        chosen = [0]
        remaining = set(range(1, len(rows)))
        one_minus = 1.0 - lam
        while len(out_rows) < k and remaining:
            best_i, best_fp = None, None
            for i in remaining:
                msim = max(pair_sim(i, j) for j in chosen)
                s = fp(lam * rels[i] - one_minus * msim)
                if (
                    best_fp is None
                    or s > best_fp
                    or (s == best_fp and ids[i] < ids[best_i])
                ):
                    best_i, best_fp = i, s
            out_rows.append((len(out_rows) + 1, ids[best_i], best_fp))
            chosen.append(best_i)
            remaining.discard(best_i)

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("mmr_rank", LongType()),
            StructField(key_col, df.schema[key_col].dataType),
            StructField("mmr_score", DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(
        [(r, i, s / 1_000_000.0) for r, i, s in out_rows], schema
    )
