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
