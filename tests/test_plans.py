"""Physical-plan invariants: the scale properties the engine is designed
around must be visible in the executed plans, not just intended."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["rel_revenue_by_nation", "rel_brand_revenue", "temporal_range_join",
     "dedup_minhash_pairs"],
)
def test_no_nested_loop_joins(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_scalar_broadcast_is_the_only_nested_loop(spark):
    # the 1-row total_docs broadcast cross join (A4) is the ONE legitimate
    # BroadcastNestedLoopJoin — build side is a single aggregate row
    plan = _plan(spark, "tfidf_search")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= plan.count("Cross")


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "rel_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3  # nation, customer, orders chain
    assert "SortMergeJoin" not in plan


def test_tfidf_scan_prunes_columns(spark):
    plan = _plan(spark, "tfidf_full")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert schemas
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"doc_id", "text"}


def test_filter_pushed_to_scan(spark):
    plan = _plan(spark, "temporal_asof_join")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("event_type" in p or "IsNotNull" in p for p in pushed)


def test_partial_aggregation_planned(spark):
    # Catalyst must plan partial+final hash aggregation for the word count
    # (the map-side combine the reference never configured)
    plan = _plan(spark, "tfidf_word_count")
    assert plan.count("HashAggregate") >= 2
