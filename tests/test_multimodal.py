"""Multimodal plumbing: binary columns, Arrow-batched stub decode."""

from __future__ import annotations

import pytest

import hashlib

from tf_idf_mapreduce_spark.operators.multimodal import (
    N_FEATURES,
    THUMB_SIDE,
    decode_media,
    extract_media_features,
    frame_sample,
    media_from_documents,
    resize_thumbnails,
)


def test_decode_stub_strict_mode_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image/png", fake=False)


def test_decode_stub_deterministic_histogram():
    payload = bytes(range(64))
    f1 = decode_media(payload, "application/octet-stream")
    f2 = decode_media(payload, "application/octet-stream")
    assert f1 == f2
    assert len(f1) == N_FEATURES
    assert abs(sum(f1) - 1.0) < 1e-6


def test_extract_media_features_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "")], "doc_id long, text string"
    )
    media = media_from_documents(docs)
    rows = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert rows[1].n_bytes == 11
    assert rows[2].n_bytes == 0
    assert rows[1].format == "text/plain"
    assert len(rows[1].features) == N_FEATURES
    # histogram over real bytes: sums to ~1 for non-empty payloads
    assert abs(sum(rows[1].features) - 1.0) < 1e-5


def test_frame_sample_covers_every_other_frame(spark, sf_dir):
    frames = frame_sample(spark, sf_dir).collect()
    assert frames
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert 0 < r.frame_bytes <= 256
        assert len(r.frame_md5) == 32
    # deterministic: same digest on re-run
    again = {(r.doc_id, r.frame_idx): r.frame_md5 for r in frame_sample(spark, sf_dir).collect()}
    for r in frames:
        assert again[(r.doc_id, r.frame_idx)] == r.frame_md5


def test_resize_thumbnails_stride_sampling(spark):
    payload = bytes(range(256))  # a 16x16 "bitmap"
    docs = spark.createDataFrame(
        [(1, payload.decode("latin-1"))], "doc_id long, text string"
    )
    # build media directly to keep the payload byte-exact (latin-1 would
    # re-encode multi-byte in UTF-8)
    from pyspark.sql import functions as F

    media = docs.select("doc_id", F.lit(payload).alias("media"))
    r = resize_thumbnails(media).head()
    assert r.src_side == 16
    assert r.thumb_side == THUMB_SIDE
    expected = bytearray()
    for row in range(8):
        for c in range(8):
            expected.append(payload[(row * 16 // 8) * 16 + (c * 16 // 8)])
    assert r.thumb_md5 == hashlib.md5(bytes(expected)).hexdigest()


def test_resize_strict_mode_raises(spark):
    from pyspark.sql import functions as F
    import pytest as _pytest

    media = spark.createDataFrame([(1,)], "doc_id long").select(
        "doc_id", F.lit(b"xyz").alias("media")
    )
    with _pytest.raises(Exception):
        resize_thumbnails(media, fake=False).collect()


def test_media_binary_roundtrip(spark):
    docs = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    r = media_from_documents(docs).head()
    assert bytes(r.media).decode("utf-8") == "héllo"
    assert r.n_bytes == 6  # é is 2 bytes in UTF-8
