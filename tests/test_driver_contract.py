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
