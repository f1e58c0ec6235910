"""Property tests: the single-exchange as-of join (union + tagged sort +
last-non-null window) equals a brute-force reference on arbitrary small
inputs — heavy on the cases the window formulation must get right: ties on
(key, ts), ties among right rows on payload, keys missing from one side,
and left rows before/after every right row."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tf_idf_mapreduce_spark.operators.temporal import asof_join

# tiny domains force collisions: few keys, few timestamps, few payloads
_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=9),   # ts
        st.integers(min_value=0, max_value=4),   # payload value
    ),
    min_size=0,
    max_size=12,
)


def _reference(left, right, direction):
    out = []
    for lk, lts, lval in left:
        if direction == "backward":
            cands = [(rts, rval) for rk, rts, rval in right if rk == lk and rts <= lts]
            best_ts = max((ts for ts, _ in cands), default=None)
        else:
            cands = [(rts, rval) for rk, rts, rval in right if rk == lk and rts >= lts]
            best_ts = min((ts for ts, _ in cands), default=None)
        if best_ts is None:
            out.append((lk, lts, lval, None))
        else:
            # among right rows tied on (key, ts): greatest payload tuple wins
            out.append(
                (lk, lts, lval, max(v for ts, v in cands if ts == best_ts))
            )
    return sorted(out, key=lambda t: (t[0], t[1], t[2], -1 if t[3] is None else t[3]))


@settings(max_examples=15, deadline=None)
@given(_ROWS, _ROWS, st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows, direction):
    left = spark.createDataFrame(
        [(k, t, v) for k, t, v in left_rows] or [(99, 0, 0)],
        "key long, ts long, lval long",
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in right_rows] or [(98, 0, 0)],
        "key long, ts long, rval long",
    )
    got = [
        (r.key, r.ts, r.lval, r.rval_asof)
        for r in asof_join(
            left, right, on="key", ts="ts", right_cols=["rval"],
            direction=direction,
        ).collect()
    ]
    got.sort(key=lambda t: (t[0], t[1], t[2], -1 if t[3] is None else t[3]))
    want = _reference(
        left_rows or [(99, 0, 0)], right_rows or [(98, 0, 0)], direction
    )
    assert got == want


_RJ_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=-10, max_value=10),  # ts (negatives probe
                                                   # the bucket-floor math)
    ),
    min_size=0,
    max_size=10,
)


@settings(max_examples=15, deadline=None)
@given(_RJ_ROWS, _RJ_ROWS, st.sampled_from([1, 3, 5]))
def test_range_join_banded_matches_bruteforce(spark, left_rows, right_rows, band):
    from tf_idf_mapreduce_spark.operators.temporal import range_join_banded

    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows] or [(9, 0)], "key long, lts long"
    )
    right = spark.createDataFrame(
        [(k, t) for k, t in right_rows] or [(8, 0)], "key long, rts long"
    )
    got = sorted(
        (r.key, r.lts, r.rts)
        for r in range_join_banded(
            left, right, on="key", left_ts="lts", right_ts="rts", band=band
        ).collect()
    )
    want = sorted(
        (lk, lt, rt)
        for lk, lt in (left_rows or [(9, 0)])
        for rk, rt in (right_rows or [(8, 0)])
        if lk == rk and abs(lt - rt) <= band
    )
    assert got == want


def _reference_nearest(left, right, tolerance):
    out = []
    for lk, lts, lval in left:
        prev = [rts for rk, rts, _ in right if rk == lk and rts <= lts]
        nxt = [rts for rk, rts, _ in right if rk == lk and rts >= lts]
        pg = (lts - max(prev)) if prev else None
        ng = (min(nxt) - lts) if nxt else None
        if tolerance is not None:
            pg = pg if pg is not None and pg <= tolerance else None
            ng = ng if ng is not None and ng <= tolerance else None
        if pg is not None and (ng is None or pg <= ng):
            out.append((lk, lts, lval, lts - pg, pg, "backward"))
        elif ng is not None:
            out.append((lk, lts, lval, lts + ng, ng, "forward"))
        else:
            out.append((lk, lts, lval, None, None, None))
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@settings(max_examples=15, deadline=None)
@given(_ROWS, _ROWS, st.sampled_from([None, 0, 2, 5]))
def test_asof_nearest_matches_bruteforce(spark, left_rows, right_rows, tol):
    from tf_idf_mapreduce_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        left_rows or [(99, 0, 0)], "key long, ts long, lval long"
    )
    right = spark.createDataFrame(
        right_rows or [(98, 0, 0)], "key long, ts long, rval long"
    )
    got = sorted(
        (
            (r.key, r.ts, r.lval, r.ts_nearest, r.gap_ts, r.matched_direction)
            for r in asof_nearest(
                left, right, on="key", ts="ts", right_cols=["ts"],
                tolerance=tol,
            ).collect()
        ),
    )
    want = _reference_nearest(
        left_rows or [(99, 0, 0)], right_rows or [(98, 0, 0)], tol
    )
    assert got == want
