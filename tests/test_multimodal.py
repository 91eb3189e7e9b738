"""Multimodal binary-column plumbing and codec correctness."""

from __future__ import annotations

import pyspark.sql.functions as F

from external_benchmarks_spark.catalog import Catalog
from external_benchmarks_spark.multimodal.binaryops import (
    blob_metadata,
    make_mp3_blobs,
    make_mp4_blobs,
    mp3_metadata,
    mp4_metadata,
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


def test_mp3_metadata_matches_key_arithmetic(spark, sf_dir):
    """Real MP3 frame-header walk over generated MPEG-1 L3 streams: every
    parsed field equals the fixture's integer arithmetic on doc_id."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id").limit(60)
    out = mp3_metadata(make_mp3_blobs(docs), "blob")
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,sample_rate:int,bitrate_kbps:int,"
        "n_frames:int,duration_ms:bigint>"
    )
    for r in out.collect():
        k = r.doc_id
        sr = (44100, 48000, 32000)[k % 3]
        assert r.sample_rate == sr
        assert r.bitrate_kbps == (32, 40, 48, 56, 64)[k % 5]
        assert r.n_frames == 4 + k % 6
        assert r.duration_ms == (4 + k % 6) * 1152 * 1000 // sr


def test_mp3_parser_id3_and_junk_handling():
    import pytest

    from external_benchmarks_spark.multimodal.codecs import (
        encode_mp3_frames,
        parse_mp3_metadata,
    )

    with_tag = encode_mp3_frames(sr_idx=1, br_idx=2, n_frames=3, id3_pad=37)
    no_tag = encode_mp3_frames(sr_idx=1, br_idx=2, n_frames=3)
    assert parse_mp3_metadata(with_tag) == parse_mp3_metadata(no_tag)
    # trailing garbage stops the walk cleanly
    assert parse_mp3_metadata(no_tag + b"\x00garbage")["n_frames"] == 3
    with pytest.raises(ValueError, match="no MP3 frames"):
        parse_mp3_metadata(b"not audio at all")


def test_mp4_metadata_matches_key_arithmetic(spark, sf_dir):
    """Real ISO-BMFF box walk over generated MP4s: track counts, movie
    duration, and audio rate all equal the fixture arithmetic."""
    docs = Catalog(spark, sf_dir).documents.select("doc_id").limit(60)
    out = mp4_metadata(make_mp4_blobs(docs), "blob")
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_tracks:int,n_video:int,n_audio:int,"
        "duration_ms:bigint,audio_rate:int>"
    )
    for r in out.collect():
        k = r.doc_id
        assert r.n_video == 1 + k % 2
        assert r.n_audio == k % 3
        assert r.n_tracks == r.n_video + r.n_audio
        assert r.duration_ms == 500 * (1 + k % 8)
        assert r.audio_rate == (0, 16000, 44100)[k % 3]


def test_mp4_parser_rejects_malformed():
    import pytest

    from external_benchmarks_spark.multimodal.codecs import parse_mp4_metadata

    with pytest.raises(ValueError):
        parse_mp4_metadata(b"\x00\x00\x00\x08free")  # no moov
    with pytest.raises(ValueError):
        parse_mp4_metadata(b"\x00\x00\x00\x03xx")  # malformed size


# --- REAL codec paths (multimodal/codecs.py) -------------------------------


def test_png_codec_roundtrip():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for shape in [(1, 1), (9, 13), (16, 8), (6, 6, 3)]:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape and (out == img).all()


def test_png_decode_rejects_non_png():
    import pytest as _pytest

    from external_benchmarks_spark.multimodal.codecs import decode_png

    with _pytest.raises(ValueError):
        decode_png(b"definitely not a png")


def test_wav_codec_roundtrip():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import (
        decode_wav,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(11)
    s = rng.randint(-32768, 32767, size=777).astype(np.int16)
    rate, back = decode_wav(encode_wav_pcm16(s, 22050))
    assert rate == 22050 and (back == s).all()


def test_decode_image_real_kernel(spark, sf_dir):
    from external_benchmarks_spark.multimodal.binaryops import (
        decode_image,
        make_image_blobs,
    )

    docs = make_image_blobs(Catalog(spark, sf_dir).documents.select("doc_id").limit(25))
    rows = decode_image(docs, "blob").collect()
    assert len(rows) == 25
    for r in rows:
        k = r.doc_id
        assert (r.width, r.height) == (8 + k % 9, 8 + k % 7)
        expected = [(k + rr) % 256 for rr in range(r.height)]
        assert r.min_px == min(expected) and r.max_px == max(expected)
        assert abs(r.mean_px - sum(expected) / len(expected)) < 1e-9


def test_decode_audio_real_kernel(spark, sf_dir):
    from external_benchmarks_spark.multimodal.binaryops import (
        decode_audio,
        make_audio_blobs,
    )

    docs = make_audio_blobs(Catalog(spark, sf_dir).documents.select("doc_id").limit(25))
    rows = decode_audio(docs, "blob").collect()
    assert len(rows) == 25
    for r in rows:
        k = r.doc_id
        amp = (k % 100) * 256
        assert r.n_samples == 64 + k % 37
        assert r.sample_rate == 16000
        assert r.peak == amp and r.rms == float(amp)


# --- round-3 codecs: BMP, GIF (LZW), baseline JPEG, auto-dispatch ---------


def test_bmp_roundtrip_exact():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    for shape in [(5, 7), (16, 9), (1, 1)]:
        rgb = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(rgb)) == rgb).all()
        g = rng.integers(0, 256, shape).astype(np.uint8)
        assert (decode_bmp(encode_bmp(g)) == np.stack([g] * 3, axis=2)).all()


def test_gif_roundtrip_exact_with_lzw_growth():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    # 256 distinct values force code-width growth past 9 bits and a
    # table reset at 4096 entries on a 64x97 image.
    big = rng.integers(0, 256, (64, 97)).astype(np.uint8)
    assert (decode_gif(encode_gif(big)) == np.stack([big] * 3, axis=2)).all()
    rgb = (rng.integers(0, 6, (40, 40, 3)) * 40).astype(np.uint8)
    assert (decode_gif(encode_gif(rgb)) == rgb).all()


def test_jpeg_roundtrip_quality():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 96)
    g = np.clip(np.add.outer(x, x / 2) / 1.5, 0, 255).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, quality=90))
    assert d.shape == g.shape
    err = d.astype(float) - g.astype(float)
    psnr = 10 * np.log10(255**2 / max((err**2).mean(), 1e-9))
    assert psnr > 40, psnr  # smooth gradients survive q90 nearly losslessly

    h, w = 40, 56
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    rgb[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    rgb[..., 2] = 77
    d = decode_jpeg(encode_jpeg(rgb, quality=92))
    assert d.shape == rgb.shape
    err = d.astype(float) - rgb.astype(float)
    assert 10 * np.log10(255**2 / (err**2).mean()) > 38

    # non-multiple-of-8 dimensions: edge blocks pad, output crops back
    odd = np.clip(np.add.outer(np.arange(13) * 9, np.arange(21) * 5), 0, 255).astype(
        np.uint8
    )
    d2 = decode_jpeg(encode_jpeg(odd, quality=85))
    assert d2.shape == odd.shape
    assert abs(d2.astype(int) - odd.astype(int)).max() < 40


def test_image_auto_dispatch():
    import numpy as np
    import pytest

    from external_benchmarks_spark.multimodal.codecs import (
        decode_image_auto,
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_png,
        sniff_image_format,
    )

    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
    for enc, fmt in [
        (encode_png, "png"),
        (encode_bmp, "bmp"),
        (encode_gif, "gif"),
        (encode_jpeg, "jpeg"),
    ]:
        blob = enc(g)
        assert sniff_image_format(blob) == fmt
        decode_image_auto(blob)  # must not raise
    with pytest.raises(ValueError):
        sniff_image_format(b"\x00\x01\x02\x03garbage")


def test_multiformat_blobs_match_png_stats(spark, sf_dir):
    """PNG/BMP/GIF containers of the same gradient must produce identical
    decoded statistics — the property the shared SQL oracle relies on."""
    from external_benchmarks_spark.multimodal.binaryops import (
        decode_image,
        make_image_blobs,
        make_multiformat_image_blobs,
    )
    from external_benchmarks_spark.catalog import Catalog

    docs = Catalog(spark, sf_dir).documents.select("doc_id").limit(60)
    a = {
        r.doc_id: (r.width, r.height, r.mean_px, r.min_px, r.max_px)
        for r in decode_image(make_image_blobs(docs), "blob").collect()
    }
    b = {
        r.doc_id: (r.width, r.height, r.mean_px, r.min_px, r.max_px)
        for r in decode_image(make_multiformat_image_blobs(docs), "blob").collect()
    }
    assert a == b and len(a) == 60


def test_animated_gif_frames_roundtrip():
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import (
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 8, (11, 14)) * 30).astype(np.uint8) for _ in range(5)]
    back = decode_gif_frames(encode_gif_frames(frames))
    assert len(back) == 5
    for f, b in zip(frames, back):
        assert (b == np.stack([f] * 3, axis=2)).all()


def test_resize_image_real_kernel(spark, sf_dir):
    """Decode -> integer nearest-neighbor resize -> PNG re-encode; the
    thumbnail must itself decode to the expected fixed geometry with
    pixel values drawn from the source gradient."""
    import numpy as np

    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.multimodal.binaryops import (
        make_multiformat_image_blobs,
        resize_image,
    )
    from external_benchmarks_spark.multimodal.codecs import decode_png

    docs = Catalog(spark, sf_dir).documents.select("doc_id").limit(30)
    rows = resize_image(
        make_multiformat_image_blobs(docs), "blob", width=16, height=12
    ).collect()
    assert len(rows) == 30
    for r in rows:
        img = decode_png(bytes(r.thumb))
        gray = img if img.ndim == 2 else img.mean(axis=2).astype(np.uint8)
        assert gray.shape == (12, 16)
        k = int(r.doc_id)
        # nearest-neighbor preserves exact source values: row 0 of the
        # thumb is row 0 of the source gradient, i.e. k % 256
        assert int(gray[0, 0]) == k % 256


def test_frame_sample_counts(spark, sf_dir):
    from external_benchmarks_spark.catalog import Catalog
    from external_benchmarks_spark.multimodal.binaryops import (
        frame_sample,
        make_video_blobs,
    )

    docs = Catalog(spark, sf_dir).documents.select("doc_id").limit(40)
    rows = frame_sample(make_video_blobs(docs), "blob", every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for k, idxs in by_doc.items():
        n = 3 + k % 4
        assert sorted(idxs) == list(range(0, n, 2))


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn conformance: a restart-interval stream must decode to the
    exact same pixels as the same image without restarts."""
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(0)
    img = (
        (np.linspace(0, 255, 40 * 56).reshape(40, 56) + rng.randn(40, 56) * 8)
        .clip(0, 255)
        .astype(np.uint8)
    )
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5, 7):
        rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=ri))
        assert np.array_equal(plain, rst), f"restart_interval={ri}"
    rgb = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, quality=95)),
        decode_jpeg(encode_jpeg(rgb, quality=95, restart_interval=3)),
    )


def _craft_gif(frames_spec):
    """Build a 4x4 GIF89a from (left, top, iw, ih, indices, (disposal, tidx))."""
    import struct

    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import _gif_lzw_encode

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0]], np.uint8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0x80 | (1 << 4) | 1, 3, 0)
    gif += pal.tobytes()
    for left, top, iw, ih, idx, (disposal, tidx) in frames_spec:
        packed = (disposal << 2) | (1 if tidx is not None else 0)
        gif += (
            b"\x21\xf9\x04"
            + bytes([packed, 0, 0, tidx if tidx is not None else 0])
            + b"\x00"
        )
        gif += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, 0)
        gif += bytes([2])
        lzw = _gif_lzw_encode(np.asarray(idx, np.int32), 2)
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            gif += bytes([len(c)]) + c
        gif += b"\x00"
    gif += b"\x3b"
    return bytes(gif), pal


def test_gif_partial_frame_compositing():
    """Frames with offsets/disposal/transparency composite onto the
    logical-screen canvas (external animated GIFs decode correctly)."""
    import numpy as np

    from external_benchmarks_spark.multimodal.codecs import decode_gif_frames

    gif, pal = _craft_gif(
        [
            (0, 0, 4, 4, [0] * 16, (1, None)),  # full red
            (1, 1, 2, 2, [1] * 4, (1, None)),  # green patch, leave
            (0, 0, 2, 2, [2] * 4, (2, None)),  # blue patch, restore-bg
            (0, 0, 4, 4, [1, 3, 1, 3] * 4, (1, 3)),  # checker, idx 3 clear
        ]
    )
    fr = decode_gif_frames(gif)
    assert len(fr) == 4
    assert all(f.shape == (4, 4, 3) for f in fr)  # full canvas, not sub-rects
    # frame 2 = green patch OVER the red frame 1
    assert np.array_equal(fr[1][1:3, 1:3], np.tile(pal[1], (2, 2, 1)))
    assert np.array_equal(fr[1][0, :], np.tile(pal[0], (4, 1)))
    # frame 3 shows the blue patch; its disposal=2 restores that rect to bg
    assert np.array_equal(fr[2][0:2, 0:2], np.tile(pal[2], (2, 2, 1)))
    # frame 4: drawn pixel, transparent-over-restored-bg, transparent-over-red
    assert np.array_equal(fr[3][0, 0], pal[1])
    assert np.array_equal(fr[3][0, 1], pal[3])
    assert np.array_equal(fr[3][3, 1], pal[0])


def test_gif_oversized_frame_rect_rejected():
    import pytest

    from external_benchmarks_spark.multimodal.codecs import decode_gif_frames

    gif, _ = _craft_gif([(3, 3, 2, 2, [0] * 4, (1, None))])
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif_frames(gif)
