"""Chaos pass over the documents surface: a corpus containing the nasty
rows a 100 TB crawl actually ships — empty text, NULL text, whitespace-
only, single-char, and non-ASCII junk — must flow through every per-doc
operator family without a job abort (ANSI division, empty-array folds,
and regex edge cases are the usual mines). Values are checked only for
the planted normal row; the contract under test is NO CRASH + visible
(null/zero) damage, the same convention as the reader corruption
contracts in test_io.py and the cosine null-safety contract."""

from __future__ import annotations

import shutil

import pytest

from tests.conftest import SF_DIR

NASTY_QUERIES = [
    "text_quality",
    "text_lang_id",
    "text_token_counts",
    "text_fingerprints",
    "text_clean_corpus",
    "text_bpe_pairs",
    "text_bpe_merge_gain",
    "text_pii_scan",
    "curate_hash_sample",
    "curate_quality_classifier",
    "curate_features",
    "dedup_exact",
    "dedup_minhash_pairs",
    "tfidf_full",
]


@pytest.fixture(scope="module")
def chaos_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("chaos")
    # non-document tables ride along unchanged (some queries join them)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        (0, "", "en", "src0", 0),
        (1, None, "en", "src0", 0),
        (2, " \t \t ", "en", "src0", 6),
        (3, "a", "en", "src1", 1),
        (4, "normal text with the and of to in is it words here", "en",
         "src1", 51),
        (5, "ünïcödé junk ☃☃☃ !!!",
         "de", "src2", 20),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", NASTY_QUERIES)
def test_chaos_corpus_never_aborts(spark, chaos_dir, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, chaos_dir)
    rows = df.collect()  # the assertion IS completing without an abort
    assert rows is not None


@pytest.fixture(scope="module")
def chaos_events_dir(spark, tmp_path_factory):
    import datetime

    d = tmp_path_factory.mktemp("chaos_events")
    for t in (
        "region nation customer supplier part orders lineitem documents "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (0, ts, 1, "click", 1.0, "{}"),
        (1, None, 1, "purchase", 2.0, "{}"),          # null timestamp
        (2, ts, None, "click", 3.0, "{}"),            # null user
        (3, ts, 2, None, None, None),                 # null type/value/props
        (4, ts + datetime.timedelta(days=400), 2, "click",
         float("nan"), "{}"),                         # NaN value, far future
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


# representative spread: windows, sessionize, funnel, as-of joins, SCD2,
# CDC, anomaly — the operators where a null ts/user or NaN value would
# poison a window frame or an ANSI comparison
NASTY_EVENT_QUERIES = [
    "events_sessionize",
    "events_funnel",
    "events_retention",
    "events_anomaly",
    "events_rfm",
    "temporal_asof_join",
    "temporal_latest_snapshot",
    "temporal_range_join",
]


@pytest.mark.parametrize("name", NASTY_EVENT_QUERIES)
def test_chaos_events_never_abort(spark, chaos_events_dir, name):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()[name](spark, chaos_events_dir).collect()
    assert rows is not None


# --- real-codec decoder chaos: the three dependency-free codecs --------
#
# Same contract as the text/events passes, applied to the media kernels:
# a truncated RIFF chunk table, a zero-frame / malformed Y4M, and a 1x1
# or raster-truncated P6 PPM must flow through the Arrow kernels without
# a job abort — corrupt payloads surface as structured-NULL rows, valid
# edge-case payloads decode for real.


def _good_wav(samples):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _media_df(spark, payloads):
    rows = [(i, bytearray(p), "x", len(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "doc_id long, media binary, media_format string, n_bytes long"
    )


def test_chaos_wav_kernels_null_not_abort(spark):
    from tf_idf_mapreduce_spark.operators.multimodal import (
        audio_features,
        audio_vad,
    )

    good = _good_wav([0, 1000, -1000, 2000, 0, 0, 0, 0])
    payloads = [
        good,
        b"",                              # empty blob
        b"RIFF\x10\x00\x00\x00WAVE",      # header only, no chunks
        good[:30],                        # truncated mid-chunk-table
        b"RIFF\x08\x00\x00\x00JUNK",      # wrong form type
        good[:20] + b"\xff" * 4 + good[24:],  # fmt chunk size lies
    ]
    got = {r.doc_id: r for r in audio_features(_media_df(spark, payloads)).collect()}
    assert len(got) == len(payloads)
    assert got[0].sample_rate == 8000 and got[0].n_samples == 8
    assert got[0].peak == 2000 and got[0].energy > 0
    for bad in (1, 2, 3, 4, 5):
        assert got[bad].sample_rate is None and got[bad].energy is None
    vad = {r.doc_id: r for r in audio_vad(_media_df(spark, payloads)).collect()}
    assert vad[0].n_frames is not None
    for bad in (1, 2, 3, 4, 5):
        assert vad[bad].n_frames is None and vad[bad].active_ratio is None


def test_chaos_y4m_kernel_null_not_abort(spark):
    from tf_idf_mapreduce_spark.operators.multimodal import (
        Y4M_FRAME_BYTES,
        scene_cuts,
    )

    head = b"YUV4MPEG2 W4 H4 F25:1 C444\n"
    frame = lambda b: b"FRAME\n" + bytes([b]) * Y4M_FRAME_BYTES
    payloads = [
        head + frame(0) + frame(255),     # one real cut
        head,                             # ZERO frames — valid, no pairs
        head + frame(0)[: 20],            # truncated frame
        b"not a y4m at all",              # no header
        b"YUV4MPEG2 W-4 H4 C444\n",       # negative dim (idx-walk trap)
        head + b"FRAME\n"[:3],            # malformed FRAME marker
        b"YUV4MPEG2 W4 H4 C420\n",        # unsupported chroma
    ]
    rows = scene_cuts(_media_df(spark, payloads)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [ (r.frame_idx, r.sad, r.is_cut) for r in by_doc[0] ] == [
        (1, 255 * Y4M_FRAME_BYTES, True)
    ]
    assert 1 not in by_doc  # zero frames -> zero pairs, clean decode
    for bad in (2, 3, 4, 5, 6):
        assert [(r.frame_idx, r.sad, r.is_cut) for r in by_doc[bad]] == [
            (None, None, None)
        ]


def test_chaos_ppm_kernels_null_not_abort(spark):
    from tf_idf_mapreduce_spark.operators.multimodal import (
        ahash_images,
        resize_thumbnails,
    )

    one_px = b"P6\n1 1\n255\n\x80\x40\x20"       # 1x1 — valid minimum
    payloads = [
        one_px,
        b"P6\n4 4\n255\n" + b"\x01" * 10,         # truncated raster
        b"P6\n",                                  # header cut mid-dims
        b"P6\n4 4\n65535\n" + b"\x00" * 96,       # 2-byte maxval
        b"P6\n# only a comment",                  # comment to EOF
    ]
    thumbs = {r.doc_id: r for r in resize_thumbnails(_media_df(spark, payloads)).collect()}
    assert thumbs[0].src_side == 1 and thumbs[0].thumb_md5 is not None
    hashes = {r.doc_id: r for r in ahash_images(_media_df(spark, payloads)).collect()}
    # 1x1: every sampled pixel is the same red byte -> all bits equal
    assert hashes[0].ahash_bits in ("1" * 64, "0" * 64)
    for bad in (1, 2, 3, 4):
        assert thumbs[bad].thumb_md5 is None and thumbs[bad].src_side is None
        assert hashes[bad].ahash_bits is None


@pytest.fixture(scope="module")
def giant_doc_dir(spark, tmp_path_factory):
    """One multi-MB document planted among normal rows — the degenerate
    row that OOMs the reference's A2 reducer (CountTF.java:87-109
    buffers the whole document in reducer memory). The Spark plans are
    spillable by construction; this fixture proves it at default
    executor memory, no config bumps."""
    d = tmp_path_factory.mktemp("giant")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    # ~4 MB of text, ~580k words over a 4k-word LETTER-ONLY vocabulary
    # (the reference tokenizer drops digit-bearing words — T2); repeats
    # exercise the per-(word,doc) aggregate, and sentence punctuation
    # every 20 words gives the chunker boundaries to split on
    vocab = [
        "w" + "".join(chr(97 + (v // 26**k) % 26) for k in range(3))
        for v in range(4096)
    ]
    words = []
    for i in range(580_000):
        words.append(vocab[i % 4096])
        if i % 20 == 19:
            words.append("x.")
    giant = " ".join(words)
    rows = [
        (0, "normal text with the and of to in is it words here", "en",
         "src0", 51),
        (1, giant, "en", "src1", len(giant)),
        (2, "another small doc of plain words", "en", "src0", 32),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_giant_doc_doc_totals_tokenize(spark, giant_doc_dir):
    """The reference's exact OOM shape: per-doc totals over one huge
    document. The window/aggregate formulation must return the exact
    token count, not buffer the doc."""
    from tf_idf_mapreduce_spark.functions.tokenize import tokenize
    from tf_idf_mapreduce_spark.operators.tfidf import doc_totals, word_count
    from tf_idf_mapreduce_spark.sources.io import documents_as_corpus, load_table

    corpus = documents_as_corpus(load_table(spark, giant_doc_dir, "documents"))
    wc = word_count(tokenize(corpus))
    totals = {
        r.doc: r.doc_total
        for r in doc_totals(wc).select("doc", "doc_total").distinct().collect()
    }
    # 580k vocab words + 29k 'x.' sentence markers ('x' after trim)
    assert totals["1"] == 580_000 + 29_000
    assert totals["0"] == 12


def test_giant_doc_chunking_and_lm_scoring(spark, giant_doc_dir):
    """Chunking must emit CONTEXT-bounded pieces covering the giant doc
    and LM scoring must return a finite score for it — both single
    passes, no per-doc driver state."""
    from tf_idf_mapreduce_spark.operators.textstats import (
        chunk_documents,
        lm_doc_scores,
    )

    chunks = chunk_documents(spark, giant_doc_dir)
    per_doc = {
        r.doc_id: r.n
        for r in chunks.groupBy("doc_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert per_doc[1] > 100  # the giant doc actually split
    lm = {r.doc_id: r for r in lm_doc_scores(spark, giant_doc_dir).collect()}
    assert 1 in lm


def test_giant_doc_token_counts(spark, giant_doc_dir):
    from tf_idf_mapreduce_spark.operators.textstats import token_counts

    rows = {r.doc_id: r for r in token_counts(spark, giant_doc_dir).collect()}
    assert rows[1].n_ws_tokens == 580_000 + 29_000
