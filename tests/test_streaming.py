"""Streaming queries on a finite input must equal their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tf_idf_mapreduce_spark.functions.hashing import norm_words
from tf_idf_mapreduce_spark.operators import events as ev
from tf_idf_mapreduce_spark.sources.io import load_table
from tf_idf_mapreduce_spark.streaming import queries as st


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_wordcount_matches_batch(spark, sf_dir):
    got = st.q_stream_wordcount(spark, sf_dir)
    want = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(norm_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    assert _rows(got, ["word", "n"]) == _rows(want, ["word", "n"])


def test_stream_tumbling_matches_batch(spark, sf_dir):
    got = st.q_stream_tumbling_hourly(spark, sf_dir)
    want = ev.q_tumbling_hourly(spark, sf_dir)
    cols = ["hour_start_sec", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_session_window_vs_batch_convention(spark, sf_dir):
    """session_window sessions must equal lag-based sessions computed with
    the strict-gap convention (gap >= 1800 starts a new session)."""
    got = st.q_stream_session_window(spark, sf_dir)
    # batch twin with >= convention: shift the gap by 1 second
    want = ev.sessionize(ev.load_events(spark, sf_dir), gap_sec=ev.SESSION_GAP_SEC - 1)
    cols = ["user_id", "session_start_sec", "session_end_sec", "n_events"]
    got_rows = _rows(got, cols)
    want_rows = _rows(want, cols)
    # gap_sec-1 turns "diff > 1799" into "diff >= 1800" only for integer
    # second resolution — which ts_sec has. Exact match expected.
    assert got_rows == want_rows


def test_stateful_sessions_are_batch_minus_open_tail(spark, sf_dir):
    got = st.q_stream_stateful_sessions(spark, sf_dir)
    sessions = ev.q_sessionize(spark, sf_dir)
    w = Window.partitionBy("user_id")
    want = (
        sessions.withColumn("max_seq", F.max("session_seq").over(w))
        .where(F.col("session_seq") < F.col("max_seq"))
    )
    cols = ["user_id", "session_start_sec", "session_end_sec", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    # every emitted session is closed: gap to the next session's start > 30 min
    assert got.count() > 0
