#!/usr/bin/env python3
"""Physical-plan audit: evidence that the expensive queries carry the
plans we claim they do.

For the N slowest queries in ``BENCH_DETAIL.json`` (plus any named on
the command line), renders the executed plan and summarizes the
scale-relevant facts — exchange count, broadcast joins, cartesian /
nested-loop joins, pushed filters, scan column pruning, codegen spans —
into ``PLAN_AUDIT.md``. The point is reviewability: the per-operator
plan invariants live in ``tests/test_plans.py``; this artifact shows the
full plans those tests pin, refreshed in one command.

Usage: python scripts/plan_audit.py [N] [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tf_idf_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def summarize(plan: str) -> dict[str, object]:
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    return {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "hash_aggregates": plan.count("HashAggregate"),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "scans": len(scans),
        "scan_columns": [s[:100] for s in scans],
        "pushed_filter_scans": len(
            [m for m in re.findall(r"PushedFilters: \[([^\n]*)", plan) if m.strip(" ]")]
        ),
        # toString renders whole-stage-codegen spans as `*(n)` prefixes
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main(argv: list[str]) -> int:
    n = int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else 10
    names = [a for a in argv[1:] if not a.isdigit()]
    if os.path.exists("BENCH_DETAIL.json"):
        with open("BENCH_DETAIL.json") as f:
            detail = json.load(f)
        times, bench_sf = detail["queries"], detail.get("sf")
    else:
        times, bench_sf = {}, None
    slowest = sorted(times, key=lambda k: -times[k])[:n]
    targets = list(dict.fromkeys(slowest + names))

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = ["# Plan audit\n"]
    out.append(
        f"Executed plans of the {len(targets)} most expensive queries "
        f"(by `BENCH_DETAIL.json`) at `{SF_DIR}`. Streaming drains are "
        "skipped (their batch result has no standing plan).\n"
    )
    for name in targets:
        if name.startswith("stream_"):
            continue
        try:
            df = qs[name](spark, SF_DIR)
            df.collect()  # materialize THIS plan so AQE reports its FINAL form
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - audit tool
            out.append(f"## {name}\n\nERROR: {e}\n")
            continue
        s = summarize(plan)
        t = times.get(name)
        out.append(
            f"## {name}" + (f" — {t:.2f}s at sf{bench_sf}" if t else "") + "\n"
        )
        out.append(
            "| exchanges | 1-part exch | bcast joins | SMJ | NLJ | cartesian |"
            " aggs | scans | pushed-filter scans | codegen spans |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
            f"| {s['exchanges']} | {s['single_partition_exchanges']} "
            f"| {s['broadcast_hash_joins']} | {s['sort_merge_joins']} "
            f"| {s['nested_loop_joins']} | {s['cartesian_products']} "
            f"| {s['hash_aggregates']} | {s['scans']} "
            f"| {s['pushed_filter_scans']} | {s['codegen_spans']} |\n"
        )
        for c in s["scan_columns"]:
            out.append(f"- scan: `{c}`\n")
        out.append("")
    with open("PLAN_AUDIT.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLAN_AUDIT.md ({len(targets)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
