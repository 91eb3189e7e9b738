"""Frequency sketches: count-min heavy hitters over token streams.

Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms 2005):
``depth`` independent hash rows of ``width`` counters; every occurrence
increments ``counter[j][h_j(x)]``; the frequency estimate is
``min_j counter[j][h_j(x)]`` — never an underestimate, overestimate
bounded by ``e * N / width`` with probability ``1 - e^-depth``.

Why this is the 100 TB shape for "top terms" when the vocabulary itself
is too large to group on: the sketch is a FIXED-SIZE (depth x width)
mergeable aggregate — partial sketches combine by cell-wise addition, so
the shuffle moves at most ``depth * width`` rows per partition regardless
of corpus size, and the finished sketch broadcasts to score any candidate
stream. Contrast `operators/tfidf.top_terms`, which shuffles one row per
distinct term.

Hashing: ONE md5-prefix base hash per occurrence
(`functions/hashing.md5_hash32` — cross-engine stable), then each
row's bucket is a universal-hash multiply-add-mod on it (the MinHash
coefficient device), so hashing cost is depth-independent and the
DuckDB oracle replays the sketch cell-for-cell (SURVEY.md §5.3).
Production at scale can swap in ``F.xxhash64`` via ``hash_fn``.

Reference parity: extends the reference's value_counts/top-terms surface
(scripts/generate_benchmark_reports.py:151-161, the DuckDB
``GROUP BY category ORDER BY count DESC`` path) with the sketch tier its
own 10M-row "fast path" hints at but never builds.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.functions.hashing import (
    MERSENNE_61,
    md5_hash32,
    minhash_params,
)

HashFn = Callable[[Column], Column]

# Universal-hash coefficients for the sketch rows (the MinHash device):
# the base md5 hash is computed ONCE per occurrence and each row's
# bucket is one multiply-add-mod on it — depth-independent hashing cost.
CMS_SEED = 7


def _row_params(depth: int) -> list[tuple[int, int]]:
    return minhash_params(depth, seed=CMS_SEED)


def _cell(h: Column, a: int, b: int, width: int) -> Column:
    """Bucket of base-hash `h` in the row keyed by (a, b)."""
    return ((F.lit(a) * h + F.lit(b)) % MERSENNE_61) % width


def cms_sketch(
    occurrences: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
    hash_fn: HashFn = md5_hash32,
) -> DataFrame:
    """Build a count-min sketch from one-row-per-occurrence input.

    Returns (row, bucket, cnt) — at most depth*width rows. The explode
    multiplies rows by `depth`, but partial (map-side) aggregation
    collapses each partition to <= depth*width cells before the shuffle,
    so the exchange is O(partitions * depth * width), independent of N.
    """
    h = hash_fn(F.col(token_col))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cell(h, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(_row_params(depth))
        ]
    )
    return (
        occurrences.select(F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_sketch_weighted(
    counts: DataFrame,
    token_col: str = "token",
    count_col: str = "cnt",
    depth: int = 4,
    width: int = 256,
    hash_fn: HashFn = md5_hash32,
) -> DataFrame:
    """:func:`cms_sketch` from PRE-AGGREGATED (token, count) rows.

    Cell-identical to building the sketch from the raw occurrence
    stream: a cell's value is ``SUM over tokens hashing to it of the
    token's occurrence count`` either way — integer regrouping of the
    same BIGINT sum (tested). Lets a caller that already has per-token
    counts (e.g. the exact-candidates heavy-hitters path, which needs
    the distinct token set anyway) build the sketch without a second
    pass over the corpus."""
    h = hash_fn(F.col(token_col))
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cell(h, a, b, width).alias("bucket"),
            )
            for j, (a, b) in enumerate(_row_params(depth))
        ]
    )
    return (
        counts.select(F.col(count_col).alias("_w"), F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 256,
    hash_fn: HashFn = md5_hash32,
) -> DataFrame:
    """Estimated frequency (min over rows) for each candidate token.

    The sketch side is a bounded depth*width table -> broadcast join; the
    candidate stream never shuffles. LEFT join + coalesce(0): a candidate
    hashing to a cell no occurrence touched has a true CMS estimate of 0
    for that row, and min() must see the 0 — an inner join would silently
    drop the empty cell and over-estimate (or drop the candidate
    entirely when every cell is empty).
    """
    h = hash_fn(F.col(token_col))
    probes = candidates.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cell(h, a, b, width).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(_row_params(depth))
                ]
            )
        ).alias("rb"),
    )
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("rb.row") == sketch["row"])
            & (F.col("rb.bucket") == sketch["bucket"]),
            "left",
        )
        .groupBy(token_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
                "est_count"
            )
        )
    )


def mg_candidates(
    occurrences: DataFrame,
    token_col: str = "token",
    n_counters: int = 512,
) -> DataFrame:
    """Per-partition Misra-Gries frequent-items candidates.

    Classic MG (Misra & Gries, "Finding repeated elements", Sci. Comput.
    Program. 1982) with `n_counters` counters per partition: any token
    whose partition frequency exceeds n_p/n_counters survives its
    partition, and by pigeonhole any GLOBAL (N/n_counters)-heavy hitter
    exceeds that bound in at least one partition — so the union of
    per-partition survivors is a SUPERSET of the global heavy hitters.
    Output size is bounded at n_counters * partitions rows regardless of
    vocabulary size; this is the production candidate source for
    cms_heavy_hitters at corpus scales where `distinct()` on the token
    stream is itself the bottleneck.

    mapInPandas with O(n_counters) state per partition; Arrow-batched,
    never materializes the partition.
    """
    import pandas as pd

    out_schema = f"{token_col} string"

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf[token_col]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < n_counters:
                    counters[tok] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({token_col: list(counters.keys())})

    return occurrences.select(token_col).mapInPandas(mg, out_schema).distinct()


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    hash_fn: HashFn = md5_hash32,
    candidates: str = "mg",
    mg_counters: int = 512,
) -> DataFrame:
    """Top-k most frequent whitespace tokens by count-min estimate.

    candidates="mg" (DEFAULT): per-partition Misra-Gries survivors
    (mg_candidates) — bounded candidate volume at any corpus size;
    returns the same top-k whenever mg_counters is large enough that the
    true top-k are (N/mg_counters)-heavy (tested). This is the 100 TB
    path, so a naive caller gets the bounded plan.
    candidates="exact": the full distinct token set — a
    vocabulary-sized shuffle; pinned inside the cross-engine oracle
    query (which must enumerate every candidate) and fine while the
    vocabulary fits a shuffle.

    Output: (token, est_count), est_count >= true count, ordered by
    (est_count DESC, token) for deterministic hashing.
    """
    from external_benchmarks_spark.functions.text import tokens

    occ = docs.select(F.explode(tokens(text_col)).alias("token"))
    if candidates == "mg":
        # occurrence-stream sketch + MG survivors: two bounded corpus
        # passes (the sketch exchange is depth*width cells/partition,
        # MG state is n_counters/partition) — counts are never
        # materialized, which is the point of this path.
        sketch = cms_sketch(occ, "token", depth, width, hash_fn)
        cand = mg_candidates(occ, "token", mg_counters)
    else:
        # exact path needs the full distinct token set anyway, so fold
        # BOTH the sketch and the candidates onto ONE tokenize pass: a
        # lazily-checkpointed per-token count table feeds a weighted
        # sketch (cell-identical — integer regrouping) and the candidate
        # set. r15 tried to get this via ReuseExchange and measured that
        # column pruning rewrites the candidate branch's partial
        # aggregate so the two exchanges never canonicalize equal; the
        # checkpoint shares the vocabulary shuffle physically instead
        # (plan: 2 corpus Scan+tokenize -> 1).
        tok_counts = (
            occ.groupBy("token")
            .agg(F.count(F.lit(1)).alias("_tc"))
            .localCheckpoint(eager=False)
        )
        sketch = cms_sketch_weighted(
            tok_counts, "token", "_tc", depth, width, hash_fn
        )
        cand = tok_counts.select("token")
    est = cms_estimate(cand, sketch, "token", depth, width, hash_fn)
    return est.orderBy(F.desc("est_count"), "token").limit(k)
