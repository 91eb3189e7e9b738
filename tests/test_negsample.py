"""Deterministic negative sampling: ring-successor structure and the
same-content exclusion (not exercised by the unique-text testdata)."""

from __future__ import annotations


def test_ring_structure_and_content_exclusion(spark):
    import __spark_entry__ as E

    # 6 docs, two of them identical in content
    rows = [
        (0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta"),
        (3, "epsilon"), (4, "zeta eta"), (5, "theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_negsrc")

    # rebuild the entry's pipeline on the synthetic frame
    import pyspark.sql.functions as F

    from external_benchmarks_spark.operators.ranking import global_rank

    d = df.select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("_h"),
        F.md5(F.col("doc_id").cast("string")).alias("_ring"),
    )
    r = global_rank(d, ["_ring", "doc_id"], rank_col="_r").persist()
    n = r.agg(F.count(F.lit(1)).alias("_n"))
    a = (
        r.crossJoin(F.broadcast(n))
        .select("doc_id", "_h", "_r", "_n",
                F.explode(F.expr("array(1, 2, 3)")).alias("off"))
        .withColumn("_cr", (F.col("_r") - 1 + F.col("off")) % F.col("_n") + 1)
    )
    b = r.select(F.col("_r").alias("_cr"), F.col("doc_id").alias("neg"),
                 F.col("_h").alias("_hb"))
    got = (
        a.join(b, "_cr").filter(F.col("_h") != F.col("_hb"))
        .select("doc_id", "off", "neg").collect()
    )
    pairs = {(g.doc_id, g.off): g.neg for g in got}
    # every anchor emits <= 3 negatives; the identical-content pair
    # (0, 2) never appears in either direction
    for (anchor, _), neg in pairs.items():
        assert neg != anchor
        assert {anchor, neg} != {0, 2}
    # python replay of the ring: ranks by (md5(id), id)
    import hashlib

    order = sorted(range(6), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    rank = {doc: k for k, doc in enumerate(order)}
    h = {i: hashlib.md5(t.encode()).hexdigest() for i, t in rows}
    want = {}
    for i in range(6):
        for off in (1, 2, 3):
            cand = order[(rank[i] + off) % 6]
            if h[cand] != h[i]:
                want[(i, off)] = cand
    assert pairs == want
