"""Multimodal plumbing: binary columns, Arrow-batched stub decode."""

from __future__ import annotations

import pytest

from tf_idf_mapreduce_spark.operators.multimodal import (
    N_FEATURES,
    decode_media,
    extract_media_features,
    media_from_documents,
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


def test_media_binary_roundtrip(spark):
    docs = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    r = media_from_documents(docs).head()
    assert bytes(r.media).decode("utf-8") == "héllo"
    assert r.n_bytes == 6  # é is 2 bytes in UTF-8
