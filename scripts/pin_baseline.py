"""Pin newly-registered queries into the bench baseline, same-commit.

The round-5 verdict's standing rule: no new registry entry without a
same-commit baseline pin (otherwise the query ships ungated and a
regression in it never trips `bench_gate.py`). This script measures the
named queries in ISOLATION at the baseline's scale factor — one warmup +
one timed noop-sink write, the exact action `bench_gate._retime` uses —
and writes the measurement into BOTH `BENCH_BASELINE.json` (the pinned
reference) and `BENCH_DETAIL.json` (the latest-run record the gate
compares), so `bench_gate.py` covers the query from the commit that
registers it.

Usage: python scripts/pin_baseline.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main(argv: list[str]) -> int:
    names = argv[1:]
    if not names:
        print("usage: pin_baseline.py <query> [<query> ...]")
        return 1
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __spark_entry__ as entrymod
    from tf_idf_mapreduce_spark.session import get_spark

    base_path = os.path.join(root, "BENCH_BASELINE.json")
    detail_path = os.path.join(root, "BENCH_DETAIL.json")
    with open(base_path) as f:
        base = json.load(f)
    sf = base["sf"]
    sf_dir = f"/root/testdata/sf{sf}"
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {', '.join(unknown)}")
        return 1

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # the cache-clear callables run without a session handle — export the
    # session-resolved store root so their drop_models hits the real root
    from tf_idf_mapreduce_spark.sources.model_store import (
        MODEL_STORE_ENV,
        store_root,
    )

    _root = store_root(spark)
    if _root:
        os.environ[MODEL_STORE_ENV] = _root

    def run(name: str) -> None:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    from tf_idf_mapreduce_spark.operators.caches import MODEL_CACHED_QUERIES

    timed: dict[str, float] = {}
    timed_warm: dict[str, float] = {}
    for name in names:
        run(name)  # warm the session, scans, and codegen shapes
        if name in MODEL_CACHED_QUERIES:
            # dual pin: cold (fit cache cleared — prices the fit like a
            # fresh process) AND warm (steady-state) — the round-6
            # evidence-honesty rule for model-cached queries
            MODEL_CACHED_QUERIES[name]()
            t0 = time.time()
            run(name)
            timed[name] = round(time.time() - t0, 3)
            t0 = time.time()
            run(name)
            timed_warm[name] = round(time.time() - t0, 3)
            print(f"{name}: cold {timed[name]:.3f}s / warm "
                  f"{timed_warm[name]:.3f}s @ sf{sf}")
        else:
            t0 = time.time()
            run(name)
            timed[name] = round(time.time() - t0, 3)
            print(f"{name}: {timed[name]:.3f}s @ sf{sf}")

    for path in (base_path, detail_path):
        with open(path) as f:
            doc = json.load(f)
        for name, sec in timed.items():
            if name in doc["queries"]:
                print(f"NOTE {os.path.basename(path)} already has {name} "
                      f"({doc['queries'][name]}s) — overwriting with {sec}s")
            doc["queries"][name] = sec
        if timed_warm:
            doc.setdefault("warm_queries", {}).update(timed_warm)
        key = "total_sec" if "total_sec" in doc else "value"
        doc[key] = round(sum(doc["queries"].values()), 3)
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    print(f"pinned {len(timed)} queries into baseline + detail")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
