"""Multimodal binary-column plumbing (decode kernels stubbed, Spark shape real)."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.multimodal.binaryops import (
    blob_metadata,
    decode_audio_stub,
    decode_image_stub,
    frame_sample_stub,
    resize_image_stub,
)


def _with_blobs(spark, sf_dir):
    # Fabricate a binary column from documents.text — the plumbing under
    # test is schema/batching, not codec correctness.
    return Catalog(spark, sf_dir).documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )


def test_blob_metadata(spark, sf_dir):
    docs = Catalog(spark, sf_dir).documents
    out = blob_metadata(_with_blobs(spark, sf_dir), "blob").collect()
    n_chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    assert len(out) == len(n_chars)
    for r in out[:20]:
        assert r.n_bytes == n_chars[r.doc_id]  # ascii text: bytes == chars
        assert len(r.sha_prefix) == 16


def test_decode_image_stub_shape_and_determinism(spark, sf_dir):
    blobs = _with_blobs(spark, sf_dir).limit(50)
    a = decode_image_stub(blobs, "blob", dim=8)
    assert a.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,feature:array<float>>"
    )
    rows_a = {r.doc_id: (r.width, r.height, tuple(r.feature)) for r in a.collect()}
    rows_b = {
        r.doc_id: (r.width, r.height, tuple(r.feature))
        for r in decode_image_stub(blobs, "blob", dim=8).collect()
    }
    assert rows_a == rows_b
    assert all(len(v[2]) == 8 for v in rows_a.values())


def test_decode_audio_stub_shape_and_determinism(spark, sf_dir):
    blobs = _with_blobs(spark, sf_dir).limit(50)
    a = decode_audio_stub(blobs, "blob", n_mfcc=8)
    assert a.schema.simpleString() == (
        "struct<doc_id:bigint,sample_rate:int,duration_ms:bigint,mfcc:array<float>>"
    )
    rows_a = {r.doc_id: (r.sample_rate, r.duration_ms, tuple(r.mfcc)) for r in a.collect()}
    rows_b = {
        r.doc_id: (r.sample_rate, r.duration_ms, tuple(r.mfcc))
        for r in decode_audio_stub(blobs, "blob", n_mfcc=8).collect()
    }
    assert rows_a == rows_b
    for sr, dur, mfcc in rows_a.values():
        assert sr in (8000, 16000, 22050, 44100)
        assert dur >= 0 and len(mfcc) == 8


def test_resize_image_stub_fixed_payload(spark, sf_dir):
    blobs = _with_blobs(spark, sf_dir).limit(20)
    t = resize_image_stub(blobs, "blob", width=32, height=32)
    assert t.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,thumb:binary>"
    )
    rows = t.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.width, r.height) == (32, 32)
        assert len(bytes(r.thumb)) == 32 * 32


def test_frame_sample_explodes(spark, sf_dir):
    blobs = _with_blobs(spark, sf_dir).limit(5)
    frames = frame_sample_stub(blobs, "blob", every_n=10)
    per_doc = {r.doc_id: r["count"] for r in frames.groupBy("doc_id").count().collect()}
    lens = {r.doc_id: len(r.text.encode()) for r in
            Catalog(spark, sf_dir).documents.limit(5).collect()}
    for doc_id, n in per_doc.items():
        assert n == max(lens[doc_id] // 10, 1)
