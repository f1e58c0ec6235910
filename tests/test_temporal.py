"""As-of join and banded range join semantics on hand-built edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from tf_idf_mapreduce_spark.operators.temporal import (
    asof_join,
    q_range_error_click,
    range_join_banded,
)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 100, 5), (4, 200, 10)],
        "id long, user_id long, ts long",
    ).select("id", "user_id", F.col("ts").alias("ts_sec"))
    right = spark.createDataFrame(
        [(100, 8), (100, 10), (100, 20), (100, 30), (300, 1)],
        "user_id long, ts long",
    ).select("user_id", F.col("ts").alias("ts_sec"))
    out = asof_join(left, right, on="user_id", ts="ts_sec", right_cols=["ts_sec"])
    got = {r.id: r.ts_sec_asof for r in out.collect()}
    assert got[1] == 10  # equal timestamp matches (>= semantics)
    assert got[2] == 20  # latest at-or-before 25
    assert got[3] is None  # ts 5 precedes every right row (earliest is 8)
    assert got[4] is None  # user 200 has no right rows at all


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.range(5).select(
        F.col("id"), F.lit(1).alias("user_id"), (F.col("id") * 10).alias("ts_sec")
    )
    right = spark.createDataFrame([(1, 15)], "user_id long, ts_sec long")
    out = asof_join(left, right, on="user_id", ts="ts_sec", right_cols=["ts_sec"])
    assert out.count() == 5
    got = {r.id: r.ts_sec_asof for r in out.collect()}
    assert got[0] is None and got[1] is None  # ts 0, 10 precede the right row
    assert got[2] == 15 and got[4] == 15


def test_asof_join_tie_at_same_ts_is_deterministic(spark):
    # several right rows share (key, ts): the greatest carried value wins,
    # every run — not partition arrival order
    left = spark.createDataFrame([(1, 7, 100)], "id long, user_id long, ts_sec long")
    right = spark.createDataFrame(
        [(7, 100, "a"), (7, 100, "c"), (7, 100, "b"), (7, 50, "z")],
        "user_id long, ts_sec long, tag string",
    )
    for _ in range(3):
        out = asof_join(
            left.repartition(4),
            right.repartition(4),
            on="user_id",
            ts="ts_sec",
            right_cols=["tag"],
        )
        assert out.head().tag_asof == "c"


def test_range_join_band_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 7, 1000)], "err_id long, user_id long, err_sec long"
    )
    right = spark.createDataFrame(
        [(10, 7, 940), (11, 7, 939), (12, 7, 1060), (13, 7, 1061), (14, 8, 1000)],
        "click_id long, user_id long, click_sec long",
    )
    out = range_join_banded(
        left, right, on="user_id", left_ts="err_sec", right_ts="click_sec", band=60
    )
    got = sorted(r.click_id for r in out.collect())
    assert got == [10, 12]  # inclusive band; 939/1061 out; other user out


def test_range_join_no_duplicate_pairs(spark, sf_dir):
    out = q_range_error_click(spark, sf_dir)
    assert out.count() == out.select("err_id", "click_id").distinct().count()


def test_latest_snapshot_one_row_per_user_and_is_max_ts(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.temporal import q_latest_snapshot
    from tf_idf_mapreduce_spark.sources.io import load_events

    snap = q_latest_snapshot(spark, sf_dir)
    rows = snap.collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users))  # exactly one row per key
    max_ts = {
        r.user_id: r.mx
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("ts_sec").alias("mx"))
        .collect()
    }
    assert len(rows) == len(max_ts)
    for r in rows:
        assert r.ts_sec == max_ts[r.user_id]


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 25), (3, 100, 99), (4, 200, 10)],
        "id long, user_id long, ts long",
    ).select("id", "user_id", F.col("ts").alias("ts_sec"))
    right = spark.createDataFrame(
        [(100, 8), (100, 10), (100, 30), (300, 1)],
        "user_id long, ts long",
    ).select("user_id", F.col("ts").alias("ts_sec"))
    out = asof_join(
        left, right, on="user_id", ts="ts_sec",
        right_cols=["ts_sec"], direction="forward",
    )
    got = {r.id: r.ts_sec_asof for r in out.collect()}
    assert got[1] == 10   # equal ts matches in forward direction too
    assert got[2] == 30   # earliest at-or-after 25
    assert got[3] is None  # nothing at-or-after 99
    assert got[4] is None  # user 200 has no right rows


def test_asof_forward_tie_deterministic(spark):
    left = spark.createDataFrame([(1, 7, 100)], "id long, user_id long, ts_sec long")
    right = spark.createDataFrame(
        [(7, 100, "a"), (7, 100, "c"), (7, 100, "b"), (7, 150, "z")],
        "user_id long, ts_sec long, tag string",
    )
    for _ in range(3):
        out = asof_join(
            left.repartition(4), right.repartition(4),
            on="user_id", ts="ts_sec",
            right_cols=["tag"], direction="forward",
        )
        assert out.head().tag_asof == "c"


def test_scd2_intervals_chain_per_user(spark, sf_dir):
    from tf_idf_mapreduce_spark.operators.temporal import q_scd2_history

    rows = q_scd2_history(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        # exactly one open (current) version, and it's the last
        currents = [r for r in vs if r.is_current]
        assert len(currents) == 1 and currents[0].version == len(vs)
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_sec == b.valid_from_sec
            assert a.valid_from_sec <= a.valid_to_sec


def test_asof_multi_column_carry_is_atomic(spark):
    # regression: carried right columns must come from ONE right row —
    # per-column last(ignorenulls) mixed values across tied rows when a
    # carried column was NULL (a phantom tuple matching no input row)
    left = spark.createDataFrame([(1, 7, 100)], "id long, user_id long, ts_sec long")
    right = spark.createDataFrame(
        [(7, 100, 5, 1), (7, 100, None, 9)],
        "user_id long, ts_sec long, a int, b int",
    )
    out = asof_join(
        left, right, on="user_id", ts="ts_sec", right_cols=["a", "b"]
    ).head()
    # winner must be an actual input row: (5, 1) or (None, 9) — struct
    # ordering makes (None, 9) the greatest tuple only if nulls sort high;
    # whichever wins, the PAIR must be consistent
    assert (out.a_asof, out.b_asof) in {(5, 1), (None, 9)}


def test_interval_overlap_laws(spark, sf_dir):
    """Overlap bounded by both the hour and the session; every joined
    hour really is anomalous; every anomalous hour a session covers
    appears exactly once per (session, hour)."""
    from tf_idf_mapreduce_spark.operators import events as ev
    from tf_idf_mapreduce_spark.operators import temporal as tmp

    rows = tmp.interval_overlap(spark, sf_dir).collect()
    assert rows, "fixture has anomalous hours and sessions covering them"
    anom = {
        r.hour_start_sec
        for r in ev.q_anomaly_hours(spark, sf_dir).collect()
    }
    sess = {
        (r.user_id, r.session_seq): (r.session_start_sec, r.session_end_sec)
        for r in ev.q_sessionize(spark, sf_dir).collect()
    }
    seen = set()
    for r in rows:
        key = (r.user_id, r.session_seq, r.hour_start_sec)
        assert key not in seen
        seen.add(key)
        assert r.hour_start_sec in anom
        start, end = sess[(r.user_id, r.session_seq)]
        assert 1 <= r.overlap_sec <= 3600
        assert r.overlap_sec <= end - start + 1
        # recompute the clip directly
        want = min(end, r.hour_start_sec + 3599) - max(start, r.hour_start_sec) + 1
        assert r.overlap_sec == want


def test_gap_fill_spine_is_dense_and_endpoints_observed(spark, sf_dir):
    """Every type's series is contiguous lo..hi at the bucket step; the
    first and last buckets are observed by construction (spine bounds
    come from observed aggregates)."""
    from tf_idf_mapreduce_spark.operators.temporal import (
        GAP_FILL_BUCKET_SEC,
        gap_fill_interpolate,
    )

    rows = gap_fill_interpolate(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket_start_sec)
        lo, hi = rs[0].bucket_start_sec, rs[-1].bucket_start_sec
        assert len(rs) == (hi - lo) // GAP_FILL_BUCKET_SEC + 1, et
        assert [r.bucket_start_sec for r in rs] == list(
            range(lo, hi + 1, GAP_FILL_BUCKET_SEC)
        ), et
        assert rs[0].fill_kind == "observed" and rs[-1].fill_kind == "observed"


def test_gap_fill_interpolation_matches_python_replay(spark, sf_dir):
    """Interpolated values equal a driver-side linear replay between the
    nearest observed neighbors, bit-for-bit (floor-based 6dp rounding);
    observed rows pass value_avg through untouched."""
    import math

    from tf_idf_mapreduce_spark.operators.temporal import gap_fill_interpolate

    rows = gap_fill_interpolate(spark, sf_dir).collect()
    n_gaps = 0
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket_start_sec)
        obs = [
            (r.bucket_start_sec, r.value_avg) for r in rs if r.value_avg is not None
        ]
        for r in rs:
            if r.fill_kind == "observed":
                assert r.value_filled == r.value_avg
                assert r.n_events > 0
                continue
            n_gaps += 1
            assert r.n_events == 0 and r.value_avg is None
            prev = max((o for o in obs if o[0] < r.bucket_start_sec))
            nxt = min((o for o in obs if o[0] > r.bucket_start_sec))
            frac = (r.bucket_start_sec - prev[0]) / (nxt[0] - prev[0])
            want = (
                math.floor((prev[1] + (nxt[1] - prev[1]) * frac) * 1_000_000 + 0.5)
                / 1_000_000
            )
            assert r.value_filled == want, (et, r.bucket_start_sec)
    assert n_gaps > 0, "fixture must exercise the interpolation path"


def test_interval_union_merges_islands(spark, tmp_path):
    """Hand-built coverage: user 1 has three windows where the first two
    overlap and the third touches exactly (contiguous coverage merges,
    strict-gap separates); user 2 has one isolated window."""
    import pandas as pd

    from tf_idf_mapreduce_spark.operators.temporal import (
        UNION_WINDOW_SEC as W,
        interval_union,
    )

    base = 1_700_000_000
    rows = [
        # user 1: [0, W), [W//2, W + W//2) overlap -> island A;
        # [W + W//2, ...) touches island A's end exactly -> still A;
        # [3*W, 4*W) gaps -> island B
        (1, 1, base),
        (2, 1, base + W // 2),
        (3, 1, base + W + W // 2),
        (4, 1, base + 3 * W),
        (5, 2, base),
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
            "user_id": [r[1] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = {r.user_id: r for r in interval_union(spark, str(tmp_path)).collect()}
    u1 = got[1]
    assert u1.n_windows == 4 and u1.n_islands == 2
    # island A spans [base, base + 2.5W), island B [base+3W, base+4W)
    assert u1.covered_sec == (2 * W + W // 2) + W
    assert u1.max_island_sec == 2 * W + W // 2
    u2 = got[2]
    assert (u2.n_windows, u2.n_islands, u2.covered_sec) == (1, 1, W)


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    """Tolerance semantics vs the unbounded as-of: fresh matches pass
    through unchanged, stale ones are nulled with matched=false, and
    never-matched rows stay unmatched."""
    from tf_idf_mapreduce_spark.operators.temporal import (
        ASOF_TOLERANCE_SEC,
        q_asof_purchase_click,
        q_asof_tolerance,
    )

    base = {r.event_id: r for r in q_asof_purchase_click(spark, sf_dir).collect()}
    tol = {r.event_id: r for r in q_asof_tolerance(spark, sf_dir).collect()}
    assert set(base) == set(tol)
    n_stale = 0
    for eid, b in base.items():
        t = tol[eid]
        if b.asof_click_sec is not None and b.gap_sec <= ASOF_TOLERANCE_SEC:
            assert t.matched and t.asof_click_sec == b.asof_click_sec
            assert t.gap_sec == b.gap_sec
        else:
            assert not t.matched
            assert t.asof_click_sec is None and t.gap_sec is None
            if b.asof_click_sec is not None:
                n_stale += 1
    assert n_stale > 0  # the fixture has stale matches to null out
