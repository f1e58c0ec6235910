"""Driver-contract consistency guards."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_every_oracle_key_has_a_query():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"orphan oracles: {o - q}"


def test_rows_only_queries_are_the_documented_ones():
    # sim_ivf_topk left this set in round 3 (deterministic k-means
    # replay); mm_resize left in round 4 (real P6 PPM decode, oracle
    # replays the same stride-sample arithmetic). Only the HLL sketch
    # remains engine-specific by nature.
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q - o == {"curate_profile_sketch"}


def test_entry_runs_and_has_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.columns == ["word", "doc", "tfidf"]
    assert df.count() > 0


def test_queries_md_in_sync():
    """QUERIES.md is generated from the registry; a new queries() entry
    without a regenerated doc fails here (run scripts/gen_queries_md.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_queries_md", "/root/repo/scripts/gen_queries_md.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert open("/root/repo/QUERIES.md").read() == mod.render()


def test_registry_frozen_against_pinned_artifacts():
    """Registry freeze + drift guard (round-7 verdict #7): the query
    surface is pinned THREE ways — QUERIES.md (test above), the latest
    full-oracle artifact, and the bench baseline. A queries() addition
    or removal without same-commit re-pins of all three fails CI here
    instead of surfacing at judge review. Re-pin with
    scripts/oracle_check.py --json=ORACLE_FULL_r{N}.json and
    scripts/pin_baseline.py."""
    import glob
    import json
    import re

    names = set(entrymod.queries())

    def rnum(p):
        return int(re.search(r"_r(\d+)\.json$", p).group(1))

    latest = max(glob.glob("/root/repo/ORACLE_FULL_r*.json"), key=rnum)
    oracle_names = set(json.load(open(latest))["results"])
    assert oracle_names == names, (
        f"registry vs {latest}: "
        f"missing-from-oracle={sorted(names - oracle_names)} "
        f"stale-in-oracle={sorted(oracle_names - names)}"
    )

    base = json.load(open("/root/repo/BENCH_BASELINE.json"))["queries"]
    base_names = set(base)
    assert base_names == names, (
        f"registry vs BENCH_BASELINE.json: "
        f"unpinned={sorted(names - base_names)} "
        f"stale-pins={sorted(base_names - names)}"
    )
