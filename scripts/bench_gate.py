#!/usr/bin/env python3
"""Per-query performance regression gate.

Compares a bench run's per-query wall times (``BENCH_DETAIL.json``,
written by ``bench.py``) against the pinned baseline
(``BENCH_BASELINE.json`` — round-3 per-query times at sf0.1). Fails if
any query regresses more than ``RATIO_MAX`` x its baseline, so the 2x
gate no longer floats against whatever the previous round happened to
record.

Noise guards:
- a query must regress by BOTH >RATIO_MAX x and >ABS_FLOOR_SEC to fail
  (sub-second queries jitter 2x on JVM/GC noise without meaning it);
- the detail and baseline must be from the same scale factor, else the
  comparison is skipped with a warning (exit 0 — wrong-SF runs are a
  local-iteration artifact, not a regression);
- queries present only in one side are reported but never fail the gate
  (new queries have no baseline yet);
- a flagged query is RE-TIMED in isolation (one warmup, then MIN of
  RETIME_RUNS timed runs in a fresh session) before failing: a
  full-surface bench run executes 270+ queries back-to-back in one JVM,
  and a query landing on a GC pause or state-store cleanup can record
  5-7x its real cost — and even an isolated SINGLE post-cache-clear run
  pays unsettled JVM/GC cost (the round-10 finding: text_bpe_train's
  first isolated cold run landed 2.4x while min-of-3 settled at 1.3-1.6x
  on a faster-than-pin host). min-of-N is the same estimator bench.py's
  calibration probe uses: the minimum over a few runs converges on the
  plan's real cost, which is what the pin describes. For COLD pins the
  fit cache is re-cleared before EVERY timed run, so each run prices the
  fit. The gate fails only if the min also regresses. Pass --no-retime
  to gate on the recorded numbers alone (cheaper; used in CI-ish loops).

Usage: python scripts/bench_gate.py [detail_json] [baseline_json] [--no-retime]
Exit: 0 pass, 1 regression(s).
"""

from __future__ import annotations

import json
import os
import sys
import time

RATIO_MAX = 2.0
ABS_FLOOR_SEC = 0.5
#: timed runs per flagged query in the isolated re-time; the MIN is
#: gated (see module docstring — single-shot timing can't shed
#: unsettled JVM/GC cost on the first post-cache-clear run)
RETIME_RUNS = 3


def _retime(names: list[str], sf: float, cold: set[str]) -> dict[str, float]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from tf_idf_mapreduce_spark.operators.caches import MODEL_CACHED_QUERIES
    from tf_idf_mapreduce_spark.session import get_spark

    # ALWAYS the detail file's scale factor — an SPARK_GRAFT_SF_DIR left
    # over from local iteration must not re-time a flagged sf0.1 query on
    # a 10x-smaller fixture and clear a real regression
    sf_dir = f"/root/testdata/sf{sf}"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # cache-clear callables run sessionless — point their drop_models at
    # the session-resolved store root (same fix as bench.py round 9)
    from tf_idf_mapreduce_spark.sources.model_store import (
        MODEL_STORE_ENV,
        store_root,
    )

    _root = store_root(spark)
    if _root:
        os.environ[MODEL_STORE_ENV] = _root
    qs = entrymod.queries()

    def run(name):
        # the SAME action bench.py times: a noop-datasource full write.
        # count() would let Catalyst prune the non-grouping expressions —
        # exactly where a projection/aggregate regression lives
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        # a query that THROWS during re-time (e.g. it regressed into an
        # intermittent error) is a confirmed failure, not a gate crash
        try:
            run(name)  # warm the session + scans (and codegen shapes)
            times = []
            for _ in range(RETIME_RUNS):
                if name in cold:
                    # gating the COLD pin: clear the fit cache before
                    # EVERY timed run so each one prices the fit,
                    # exactly like bench.py's cold measurement (the
                    # round-6 finding: without the clear, the gate could
                    # only ever see the warm path)
                    MODEL_CACHED_QUERIES[name]()
                t0 = time.time()
                run(name)
                times.append(time.time() - t0)
            out[name] = min(times)
            print(
                f"  re-time {name}: min {out[name]:.2f}s over "
                f"{[round(t, 2) for t in times]}"
            )
        except Exception as exc:  # noqa: BLE001 — any error = regression
            print(f"ERROR during isolated re-time of {name}: {exc}")
            out[name] = float("inf")
    return out


def main(argv: list[str]) -> int:
    no_retime = "--no-retime" in argv
    argv = [a for a in argv if a != "--no-retime"]
    detail_path = argv[1] if len(argv) > 1 else "BENCH_DETAIL.json"
    base_path = argv[2] if len(argv) > 2 else "BENCH_BASELINE.json"
    with open(detail_path) as f:
        detail = json.load(f)
    with open(base_path) as f:
        base = json.load(f)

    sf = detail.get("sf")
    if sf is None or base.get("sf") is None:
        print(
            f"ERROR: missing 'sf' key (detail={sf!r}, baseline={base.get('sf')!r})"
            " — cannot confirm the runs are comparable"
        )
        return 1
    if sf != base.get("sf"):
        print(
            f"SKIP: detail sf={sf} != baseline sf={base.get('sf')}"
            " — run bench.py at the baseline's scale factor to gate"
        )
        return 0

    # host calibration (round-9 verdict #4): both files may carry a
    # deterministic single-thread probe time (bench.host_calibration_sec).
    # Their ratio estimates how much slower/faster THIS host ran than the
    # host that pinned the baseline, so every flagged ratio is reported
    # raw AND calibration-normalized — the reviewer separates a ~1.4x
    # box slowdown from a plan regression at a glance instead of
    # re-deriving it from isolated re-times.
    host_factor = None
    if detail.get("calibration_sec") and base.get("calibration_sec"):
        host_factor = detail["calibration_sec"] / base["calibration_sec"]
        print(
            f"host calibration: detail {detail['calibration_sec']:.3f}s / "
            f"baseline {base['calibration_sec']:.3f}s -> factor "
            f"{host_factor:.2f}x (normalized ratios divide by this)"
        )

    def _norm(ratio: float) -> str:
        if host_factor is None:
            return ""
        return f", {ratio / host_factor:.2f}x host-normalized"

    cur, ref = detail["queries"], base["queries"]
    new = sorted(set(cur) - set(ref))
    gone = sorted(set(ref) - set(cur))
    if new:
        print(f"ungated (new, no baseline): {', '.join(new)}")
    if gone:
        print(f"missing from this run: {', '.join(gone)}")

    # a query that ERRORED during the bench records the -1.0 sentinel —
    # the hardest regression there is; it must never pass the ratio math
    errored = sorted(n for n, v in cur.items() if v < 0)
    for name in errored:
        print(f"FAIL {name}: errored during the bench run (recorded {cur[name]})")
    if errored:
        print(f"RESULT: FAIL ({len(errored)} queries errored)")
        return 1

    # two independent comparisons: the main table (cold for model-cached
    # queries — bench.py clears their fit caches before the timed run)
    # and the warm steady-state table for those same queries. A flagged
    # cold query re-times with its cache cleared; a flagged warm one
    # with the cache warm. Pins missing on one side are reported, never
    # failed (same rule as new queries).
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tf_idf_mapreduce_spark.operators.caches import MODEL_CACHED_QUERIES

    cur_warm = detail.get("warm_queries", {})
    ref_warm = base.get("warm_queries", {})
    warm_ungated = sorted(set(cur_warm) - set(ref_warm))
    if warm_ungated:
        print(f"ungated warm (no warm baseline): {', '.join(warm_ungated)}")

    failures = []
    for name in sorted(set(cur) & set(ref)):
        c, r = cur[name], ref[name]
        if c > r * RATIO_MAX and c - r > ABS_FLOOR_SEC:
            failures.append(("cold", name, r, c))
    for name in sorted(set(cur_warm) & set(ref_warm)):
        c, r = cur_warm[name], ref_warm[name]
        if c > r * RATIO_MAX and c - r > ABS_FLOOR_SEC:
            failures.append(("warm", name, r, c))
    if failures and not no_retime:
        # re-time per (mode, name): a query flagged in BOTH modes needs
        # two isolated measurements (cache cleared vs cache warm)
        cold_names = sorted(
            {n for mode, n, _, _ in failures if mode == "cold"}
        )
        warm_names = sorted(
            {n for mode, n, _, _ in failures if mode == "warm"}
        )
        isolated = {
            ("cold", n): t
            for n, t in _retime(
                cold_names, sf, set(cold_names) & set(MODEL_CACHED_QUERIES)
            ).items()
        }
        isolated.update(
            {
                ("warm", n): t
                for n, t in _retime(warm_names, sf, set()).items()
            }
        )
        confirmed = []
        for mode, name, r, c in failures:
            i = isolated[(mode, name)]
            if i > r * RATIO_MAX and i - r > ABS_FLOOR_SEC:
                confirmed.append((mode, name, r, min(c, i)))
            else:
                print(f"noise {name} ({mode}): recorded {c:.2f}s"
                      f"{_norm(c / r)}, isolated "
                      f"{i:.2f}s (baseline {r:.2f}s) — cleared")
        failures = confirmed
    for mode, name, r, c in failures:
        print(
            f"FAIL {name} ({mode}): {r:.2f}s -> {c:.2f}s "
            f"({c / r:.2f}x{_norm(c / r)})"
        )
    n = len(set(cur) & set(ref)) + len(set(cur_warm) & set(ref_warm))
    if failures:
        print(f"RESULT: FAIL ({len(failures)}/{n} comparisons regressed >{RATIO_MAX}x)")
        return 1
    print(f"RESULT: PASS ({n} comparisons within {RATIO_MAX}x of baseline)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
