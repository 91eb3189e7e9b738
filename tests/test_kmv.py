"""KMV distinct sketch: merge identity, exact-below-k, estimator
accuracy, and pairwise overlap vs the brute-force spec."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.operators.kmv import (
    KMV_K,
    kmv_estimate,
    kmv_pair_overlap,
    kmv_sketch,
)


def _keys(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("g"), F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_merge_identity(spark):
    """bottomk(A|B) == bottomk(bottomk(A) | bottomk(B))."""
    a = _keys(spark, 0, 3000)
    b = _keys(spark, 1500, 5000)
    direct = sorted(
        r._h for r in kmv_sketch(a.unionByName(b), "k", k=64).collect()
    )
    sa = kmv_sketch(a, "k", k=64)
    sb = kmv_sketch(b, "k", k=64)
    merged = sorted(
        r._h
        for r in sa.unionByName(sb).distinct().orderBy("_h").limit(64).collect()
    )
    assert direct == merged


def test_exact_below_k(spark):
    df = _keys(spark, 0, 100)
    est = kmv_estimate(kmv_sketch(df, "k", group_col="g"), group_col="g")
    row = est.collect()[0]
    assert row.n_sketch == 100 and row.est_distinct == 100


def test_estimate_accuracy(spark):
    df = _keys(spark, 0, 20000)
    est = kmv_estimate(kmv_sketch(df, "k", group_col="g"), group_col="g")
    row = est.collect()[0]
    assert row.n_sketch == KMV_K
    assert abs(row.est_distinct - 20000) / 20000 < 0.2


def test_pair_overlap_exact_regime(spark):
    """k >= |union|: every pair statistic is exact."""
    df = _keys(spark, 0, 1000, "g1").unionByName(_keys(spark, 500, 1500, "g2"))
    ov = kmv_pair_overlap(kmv_sketch(df, "k", k=2048, group_col="g"), "g", k=2048)
    row = ov.collect()[0]
    assert (row.seg_a, row.seg_b) == ("g1", "g2")
    assert row.n_union == 1500 and row.shared == 500
    assert row.est_union == 1500 and row.est_inter == 500
    assert row.jaccard_ppm == 500 * 1_000_000 // 1500


def test_pair_overlap_estimated_regime(spark):
    """k << |union|: jaccard estimate within sampling error of 1/3."""
    df = _keys(spark, 0, 20000, "g1").unionByName(
        _keys(spark, 10000, 30000, "g2")
    )
    ov = kmv_pair_overlap(kmv_sketch(df, "k", group_col="g"), "g")
    row = ov.collect()[0]
    true_j = 10000 / 30000
    assert abs(row.jaccard_ppm / 1e6 - true_j) < 0.10
    assert abs(row.est_union - 30000) / 30000 < 0.2


def test_streaming_maintenance_is_bit_identical_to_batch(spark, tmp_path):
    """Live maintenance: an availableNow file stream folded through
    StreamingKMV must end with EXACTLY the batch sketch's estimates AND
    pairwise overlaps over the same rows — the merge identity makes
    streaming maintenance exact."""
    from external_benchmarks_spark.streaming.kmv import StreamingKMV

    df = (
        _keys(spark, 0, 8000, "g1")
        .unionByName(_keys(spark, 4000, 12000, "g2"))
        .unionByName(_keys(spark, 0, 2000, "g3"))
    )
    src = str(tmp_path / "kmv_src")
    # several files so the stream sees multiple micro-batches
    df.repartition(6).write.parquet(src)

    stored = spark.read.parquet(src)
    batch_est = sorted(
        tuple(r)
        for r in kmv_estimate(
            kmv_sketch(stored, "k", k=128, group_col="g"), k=128, group_col="g"
        ).collect()
    )
    batch_ov = sorted(
        tuple(r)
        for r in kmv_pair_overlap(
            kmv_sketch(stored, "k", k=128, group_col="g"), "g", k=128
        ).collect()
    )

    sk = StreamingKMV(spark, "k", k=128, group_col="g")
    stream = (
        spark.readStream.schema("g string, k string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sk.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(tuple(r) for r in sk.estimate().collect()) == batch_est
    assert sorted(tuple(r) for r in sk.pair_overlap().collect()) == batch_ov
    # state is hard-bounded: <= k rows per group
    counts = sk.state_df().groupBy("g").count().collect()
    assert all(r["count"] <= 128 for r in counts)


def test_partition_invariance(spark):
    """Sketch, estimates, and overlaps are invariant to input
    partitioning — the hash total order decides, not arrival order."""
    df = _keys(spark, 0, 4000, "g1").unionByName(_keys(spark, 2000, 6000, "g2"))
    base = sorted(
        tuple(r)
        for r in kmv_pair_overlap(
            kmv_sketch(df, "k", k=128, group_col="g"), "g", k=128
        ).collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in kmv_pair_overlap(
            kmv_sketch(df.repartition(13), "k", k=128, group_col="g"), "g", k=128
        ).collect()
    )
    assert base == shuffled
