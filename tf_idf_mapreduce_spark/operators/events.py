"""Event-stream operators (batch form) over the ``events`` fixture table.

The reference is batch-only (SURVEY.md §2.7); these give the engine the
time-series surface a pipeline needs — sessionization, tumbling windows,
JSON payload extraction. ``streaming/`` hosts the Structured Streaming
variants of the same semantics.

Scale posture: everything partitions by ``user_id`` or a time bucket —
high-cardinality keys, no global windows; sessionization is the classic
lag+cumsum pattern (two window passes sharing one exchange on user_id).

Determinism: outputs use exact integer epoch-seconds (``ts_sec``) instead of
timestamps — the fixture's NANOS parquet type round-trips differently
through Spark (full nanos) and DuckDB (micro truncation), but integer
seconds derived by integer division are identical. Ordering keys keep full
``ts_ns`` resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import load_events

SESSION_GAP_SEC = 30 * 60


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_sec``. Both window passes share one exchange on
    user_id (same partitioning, same ordering).

    Returns one row per session: (user_id, session_seq, session_start_sec,
    session_end_sec, n_events, duration_sec).
    """
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    flagged = events.select(
        "user_id",
        "ts_ns",
        "event_id",
        "ts_sec",
        F.when(
            F.col("ts_sec") - F.lag("ts_sec", 1).over(w) > gap_sec, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_ids = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_ids.groupBy("user_id", "session_seq").agg(
        F.min("ts_sec").alias("session_start_sec"),
        F.max("ts_sec").alias("session_end_sec"),
        F.count("*").alias("n_events"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_events(spark, sf_dir))


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary on top of sessionize — stacked aggregation."""
    s = q_sessionize(spark, sf_dir)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("duration_sec").alias("max_duration_sec"),
    )


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: integer bucket arithmetic
    (``ts_sec - ts_sec % 3600``) — portable, and at scale cheaper than
    timestamp truncation."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy(
        (F.col("ts_sec") - F.col("ts_sec") % 3600).alias("hour_start_sec"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,2)"))
        .cast("double")
        .alias("total_value"),
    )


def q_json_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props payload + aggregates over it."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.sum(k).alias("sum_k"),
        F.count("*").alias("n_events"),
    )


FUNNEL_STEP_WINDOW_SEC = 24 * 3600


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: per user, the first view, the first click
    AFTER that view, and the first purchase AFTER that click — each within
    24 h of the previous step.

    Three chained window passes over the same user_id partition (one
    exchange; each step's min is conditional on the previous step's
    result), then one distinct-per-user aggregate that reuses the
    clustering. Only users with at least a view appear.
    Returns (user_id, view_sec, click_sec, purchase_sec, steps_completed).
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_sec")
    w = Window.partitionBy("user_id")
    step1 = ev.withColumn(
        "view_sec",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_sec"))).over(w),
    )
    step2 = step1.withColumn(
        "click_sec",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts_sec") > F.col("view_sec"))
                & (F.col("ts_sec") <= F.col("view_sec") + FUNNEL_STEP_WINDOW_SEC),
                F.col("ts_sec"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "purchase_sec",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_sec") > F.col("click_sec"))
                & (F.col("ts_sec") <= F.col("click_sec") + FUNNEL_STEP_WINDOW_SEC),
                F.col("ts_sec"),
            )
        ).over(w),
    )
    return (
        step3.where(F.col("view_sec").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("view_sec").alias("view_sec"),
            F.min("click_sec").alias("click_sec"),
            F.min("purchase_sec").alias("purchase_sec"),
        )
        .select(
            "user_id",
            "view_sec",
            "click_sec",
            "purchase_sec",
            (
                F.lit(1)
                + F.col("click_sec").isNotNull().cast("int")
                + F.col("purchase_sec").isNotNull().cast("int")
            )
            .cast("long")
            .alias("steps_completed"),
        )
    )


WEEK_SEC = 7 * 24 * 3600


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by their first-activity week,
    counted distinct in each subsequent week offset — the
    (cohort_week, week_offset, n_users) matrix behind every retention
    curve.

    Two aggregations sharing the user_id exchange: first-week per user,
    then distinct (user, week) activity joined back (broadcast — one row
    per user ≪ events) and counted per cell. Weeks are integer epoch-week
    buckets (portable; no calendar dependence).
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", (F.col("ts_sec") / WEEK_SEC).cast("long").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: for every
    (src, dst) event-type pair, how often dst immediately follows src, and
    the row-normalized probability — the first-order model behind
    next-event prediction and anomaly scoring on clickstreams.

    One exchange on ``user_id`` for the ``lead()`` sequence window
    (``ts_ns`` with ``event_id`` tiebreak — a total order, so results are
    exactly reproducible); the transition count then partial-aggregates
    map-side onto a |types|² relation that is tiny at any scale, and the
    row-normalizing window runs on that tiny relation — at 100 TB the only
    full-data pass is the one sequence shuffle.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_ns", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    row_tot = Window.partitionBy("src")
    return (
        counts.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(row_tot), 6)
        )
        .orderBy("src", "dst")
    )
