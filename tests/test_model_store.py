"""Durable model store: load-or-fit semantics for the fitted models
(IVF centroids, PQ codebooks, PCA components, BPE merges, QC weights)
and the SemDeDup disposition table.

The contract under test is the round-7 verdict's top item: a model is
FIT once, WRITTEN once as a fingerprint-keyed parquet artifact, and a
FRESH PROCESS (simulated here by clearing the L1 dict caches) LOADS the
artifact instead of re-running the distributed fit. "Loads, not refits"
is proved by monkeypatching the fit entrypoint to raise — any refit
fails the test loudly."""

from __future__ import annotations

import os
import time

import pytest


@pytest.fixture()
def model_dir_env(tmp_path, monkeypatch):
    """Route the store to a test-private root via the env fallback."""
    root = str(tmp_path / "models")
    monkeypatch.setenv("SPARK_GRAFT_MODEL_DIR", root)
    return root


def test_ivf_centroids_load_not_refit(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import similarity
    from tf_idf_mapreduce_spark.sources.io import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    similarity._IVF_CENT_CACHE.clear()
    t0 = time.time()
    fitted = similarity.ivf_centroids(e, cache_key=sf_dir)
    fit_sec = time.time() - t0
    stored = os.listdir(os.path.join(model_dir_env, "ivf_centroids"))
    assert len(stored) == 1

    # fresh process: L1 gone, store present — the fit must NOT run
    similarity._IVF_CENT_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("kmeans_fit ran despite a stored artifact")

    real = similarity.kmeans_fit
    try:
        similarity.kmeans_fit = boom
        t0 = time.time()
        loaded = similarity.ivf_centroids(e, cache_key=sf_dir)
        load_sec = time.time() - t0
    finally:
        similarity.kmeans_fit = real
    assert loaded == fitted  # bit-exact round-trip
    # the cold isolated rider regime: a load is not a fit
    assert load_sec < max(fit_sec, 0.2)


def test_pq_codebooks_load_not_refit(spark, sf_dir, model_dir_env):
    import numpy as np

    from tf_idf_mapreduce_spark.operators import similarity
    from tf_idf_mapreduce_spark.sources.io import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    similarity._PQ_BOOK_CACHE.clear()
    fitted = similarity._pq_codebooks(e, cache_key=sf_dir)
    similarity._PQ_BOOK_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("kmeans_fit ran despite a stored artifact")

    real = similarity.kmeans_fit
    try:
        similarity.kmeans_fit = boom
        loaded = similarity._pq_codebooks(e, cache_key=sf_dir)
    finally:
        similarity.kmeans_fit = real
    assert all(np.array_equal(a, b) for a, b in zip(fitted, loaded))


def test_pca_components_load_not_refit(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import similarity

    similarity._PCA_CACHE.clear()
    fitted = similarity._pca_components(
        spark, sf_dir, similarity.PCA_POWER_ITERS, second=True
    )
    similarity._PCA_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("power iteration ran despite a stored artifact")

    real = similarity._power_iterate
    try:
        similarity._power_iterate = boom
        loaded = similarity._pca_components(
            spark, sf_dir, similarity.PCA_POWER_ITERS, second=True
        )
    finally:
        similarity._power_iterate = real
    assert loaded == fitted and len(loaded) == 5


def test_bpe_merges_load_not_refit(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import textstats

    textstats._BPE_MERGE_CACHE.clear()
    fitted = textstats._bpe_learn_merges(
        spark, sf_dir, textstats.BPE_TRAIN_MERGES
    )
    textstats._BPE_MERGE_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("BPE learner ran despite a stored artifact")

    real = textstats._bpe_word_counts
    try:
        textstats._bpe_word_counts = boom
        loaded = textstats._bpe_learn_merges(
            spark, sf_dir, textstats.BPE_TRAIN_MERGES
        )
    finally:
        textstats._bpe_word_counts = real
    assert loaded == fitted and fitted


def test_qc_weights_load_not_refit(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import curation

    curation._QC_WEIGHTS_CACHE.clear()
    fitted = curation._qc_fit(spark, sf_dir)
    curation._QC_WEIGHTS_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("GD loop ran despite a stored artifact")

    real = curation._qc_fit_gd
    try:
        curation._qc_fit_gd = boom
        loaded = curation._qc_fit(spark, sf_dir)
    finally:
        curation._qc_fit_gd = real
    assert loaded == fitted and len(loaded) == 4


def test_semantic_keep_table_load_not_recompute(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import dedup

    dedup._SEMKEEP_RESULT_CACHE.clear()
    fitted = sorted(
        map(tuple, dedup.semantic_keep(spark, sf_dir).collect())
    )
    assert os.path.isdir(os.path.join(model_dir_env, "semantic_keep"))
    dedup._SEMKEEP_RESULT_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("CC ran despite a stored disposition table")

    real = dedup.connected_components
    try:
        dedup.connected_components = boom
        loaded = sorted(
            map(tuple, dedup.semantic_keep(spark, sf_dir).collect())
        )
    finally:
        dedup.connected_components = real
    assert loaded == fitted and fitted


def test_store_disabled_by_conf(spark, sf_dir, model_dir_env):
    """Setting the conf key to empty string disables durability: no
    artifact is written and every fresh call fits."""
    from tf_idf_mapreduce_spark.operators import curation
    from tf_idf_mapreduce_spark.sources.model_store import MODEL_STORE_CONF

    spark.conf.set(MODEL_STORE_CONF, "")
    try:
        curation._QC_WEIGHTS_CACHE.clear()
        w = curation._qc_fit(spark, sf_dir)
        assert len(w) == 4
        assert not os.path.exists(os.path.join(model_dir_env, "qc_weights"))
    finally:
        spark.conf.unset(MODEL_STORE_CONF)


def test_fingerprint_change_refits(spark, tmp_path, model_dir_env):
    """A regenerated fixture at the same path must produce a NEW key
    hash (refit), never silently reuse the stale artifact."""
    from tf_idf_mapreduce_spark.operators import curation

    d = str(tmp_path / "fp")
    rows = [
        (i, f"alpha beta doc {i} with some words", "en", "s", 30)
        for i in range(8)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    curation._QC_WEIGHTS_CACHE.clear()
    curation._qc_fit(spark, d)
    n1 = len(os.listdir(os.path.join(model_dir_env, "qc_weights")))

    time.sleep(0.01)  # ensure a distinct mtime_ns on regeneration
    spark.createDataFrame(
        rows + [(99, "gamma delta 42", "en", "s", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    curation._QC_WEIGHTS_CACHE.clear()
    curation._qc_fit(spark, d)
    n2 = len(os.listdir(os.path.join(model_dir_env, "qc_weights")))
    assert n2 == n1 + 1


def test_drop_models_clears_family(spark, sf_dir, model_dir_env):
    from tf_idf_mapreduce_spark.operators import curation
    from tf_idf_mapreduce_spark.sources.model_store import drop_models

    curation._QC_WEIGHTS_CACHE.clear()
    curation._qc_fit(spark, sf_dir)
    assert os.path.isdir(os.path.join(model_dir_env, "qc_weights"))
    drop_models("qc_weights")
    assert not os.path.exists(os.path.join(model_dir_env, "qc_weights"))


def test_prune_models_reaps_only_stale_artifacts(spark, sf_dir, model_dir_env):
    """Stale fingerprints are dead weight, never wrong answers — prune
    removes artifacts older than the age cutoff and leaves fresh ones
    (and live lookups) untouched."""
    from tf_idf_mapreduce_spark.operators import curation
    from tf_idf_mapreduce_spark.sources.model_store import prune_models

    curation._QC_WEIGHTS_CACHE.clear()
    fresh = curation._qc_fit(spark, sf_dir)
    fam = os.path.join(model_dir_env, "qc_weights")
    (h,) = os.listdir(fam)
    # plant a stale sibling artifact and age it past the cutoff
    stale = os.path.join(fam, "deadbeef" * 4)
    os.makedirs(stale)
    with open(os.path.join(stale, "data.parquet"), "wb") as f:
        f.write(b"x")
    old = time.time() - 90 * 86400
    os.utime(os.path.join(stale, "data.parquet"), (old, old))

    removed = prune_models(max_age_days=30)
    assert removed == 1
    assert sorted(os.listdir(fam)) == [h]
    # the surviving artifact still loads
    curation._QC_WEIGHTS_CACHE.clear()

    def boom(*a, **k):
        raise AssertionError("refit after prune of a FRESH artifact")

    real = curation._qc_fit_gd
    try:
        curation._qc_fit_gd = boom
        assert curation._qc_fit(spark, sf_dir) == fresh
    finally:
        curation._qc_fit_gd = real


def test_unwritable_store_degrades_to_compute(spark, sf_dir, monkeypatch):
    """A read-only store root (baked deployment image) must never break
    a query that worked before the store existed — the table path
    probes writability and degrades to compute-only."""
    from tf_idf_mapreduce_spark.operators import dedup

    # a path under a FILE can never be created -> makedirs raises
    monkeypatch.setenv("SPARK_GRAFT_MODEL_DIR", "/dev/null/no_store")
    dedup._INCREMENTAL_SCREEN_CACHE.clear()
    rows = dedup.incremental_dedup(spark, sf_dir).collect()
    assert rows and all(r.status in ("keep", "drop") for r in rows)
