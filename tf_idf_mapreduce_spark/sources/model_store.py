"""Durable, fingerprint-keyed parquet model store with load-or-fit.

Production shape: an index/model is FIT once, WRITTEN once, and LOADED by
every consumer — the reference's own pattern of persisting each stage's
output directory before the next job reads it (TfidfMapReduce.java:63-66),
applied to model state instead of relations. The process-lifetime dict
caches remain the L1 fast path within one session; this store is the L2
that survives the process, so a "rider" query run in a FRESH session
loads the owner's fit in milliseconds instead of silently re-paying it
(the round-7 owner-rider accounting fragility).

Layout::

    <store_root>/<model_name>/<key_hash>/data.parquet    (driver-written)
    <store_root>/<model_name>/<key_hash>/                (spark-written)

- ``store_root`` resolves, in order: spark conf
  ``spark.tf_idf_mapreduce.modelStore`` (empty string disables the store
  entirely — every call fits), env ``SPARK_GRAFT_MODEL_DIR``, then
  ``<spark.sql.warehouse.dir>/_models`` (Spark's own warehouse default).
- ``key_hash`` is the md5 of the full key tuple's repr — data
  fingerprints (file path + mtime + size), hyperparameters, and the
  partition conf. ANY change produces a new hash, so a regenerated
  fixture or a different conf refits rather than silently reusing a
  stale artifact; stale hashes are dead directories, never wrong answers.

Artifacts written here are model-sized (centroids, codebooks, loadings,
merge lists, weights) and written driver-side with pandas/pyarrow — no
Spark job. Writes are atomic (tmp + ``os.replace``), so two concurrent
sessions at worst both fit and one write wins — never a torn read. The
one Spark-written artifact (the SemDeDup disposition, a relation) uses
write-to-tmp-dir + ``os.rename`` with the same lose-gracefully contract.

At 100 TB the store root is an object-store prefix and the artifacts are
ordinary parquet tables any engine can read — the load path IS the
production serving path, not a test convenience.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from typing import Callable

#: Spark conf key for the store root. Set to "" to disable durability
#: (every call fits; the L1 dict caches still apply).
MODEL_STORE_CONF = "spark.tf_idf_mapreduce.modelStore"
#: Environment fallback used when no conf is set (also lets non-Spark
#: tooling — bench cache-clears — resolve the same root).
MODEL_STORE_ENV = "SPARK_GRAFT_MODEL_DIR"


def _strip_file_scheme(p: str) -> str:
    return p[len("file:") :] if p.startswith("file:") else p


def store_root(spark=None) -> str | None:
    """Resolve the store root; ``None`` means durability is disabled."""
    if spark is not None:
        v = spark.conf.get(MODEL_STORE_CONF, None)
        if v is not None:
            return _strip_file_scheme(v) or None
    env = os.environ.get(MODEL_STORE_ENV)
    if env is not None:
        return env or None
    if spark is not None:
        wh = _strip_file_scheme(
            spark.conf.get("spark.sql.warehouse.dir", "")
        )
        if wh:
            return os.path.join(wh, "_models")
    # no session to ask (bench cache-clear path): Spark's warehouse
    # default is <cwd>/spark-warehouse
    return os.path.join(os.getcwd(), "spark-warehouse", "_models")


def key_hash(key: tuple) -> str:
    return hashlib.md5(repr(key).encode()).hexdigest()


def model_dir(name: str, key: tuple, spark=None) -> str | None:
    root = store_root(spark)
    if root is None:
        return None
    return os.path.join(root, name, key_hash(key))


def load_or_fit_pdf(
    name: str,
    key: tuple,
    fit: Callable[[], "pandas.DataFrame"],  # noqa: F821
    spark=None,
):
    """Load the artifact for ``key`` if present, else fit + persist.

    Returns ``(pdf, origin)`` with origin in {"store", "fit"} so tests
    can prove a fresh process LOADED rather than refit. Any read failure
    (torn historical state, version skew) falls through to a refit —
    the store can only ever cost a redundant fit, never a wrong answer.
    """
    import pandas as pd

    d = model_dir(name, key, spark)
    path = None if d is None else os.path.join(d, "data.parquet")
    if path is not None and os.path.exists(path):
        try:
            return pd.read_parquet(path), "store"
        except Exception:
            pass
    pdf = fit()
    if path is not None:
        try:
            os.makedirs(d, exist_ok=True)
            tmp = f"{path}.tmp-{uuid.uuid4().hex}"
            pdf.to_parquet(tmp, index=False)
            os.replace(tmp, path)
        except Exception:
            # read-only store roots degrade to fit-every-process
            pass
    return pdf, "fit"


def load_or_compute_table(
    name: str,
    key: tuple,
    spark,
    compute: Callable[[], "pyspark.sql.DataFrame"],  # noqa: F821
):
    """Spark-relation variant of ``load_or_fit_pdf`` for artifacts that
    are TABLES, not driver-sized models (e.g. the SemDeDup disposition).

    The computed relation is written once under the store and every
    load — including the first — reads the parquet back, so all
    consumers in all sessions see literally the same files. Returns
    ``(df, origin)``.
    """
    d = model_dir(name, key, spark)
    if d is None:
        return compute(), "fit"
    if os.path.isdir(d):
        try:
            return spark.read.parquet(d), "store"
        except Exception:
            pass
    # probe writability BEFORE running compute through a parquet sink:
    # on a read-only store root (e.g. a baked deployment image) the
    # store must degrade to compute-only, never break a query that
    # worked before the store existed. Genuine compute errors still
    # surface naturally from the uncaught write below.
    try:
        os.makedirs(os.path.dirname(d), exist_ok=True)
        probe = os.path.join(
            os.path.dirname(d), f".probe-{uuid.uuid4().hex}"
        )
        with open(probe, "w"):
            pass
        os.remove(probe)
    except OSError:
        return compute(), "fit"
    tmp = f"{d}.tmp-{uuid.uuid4().hex}"
    compute().write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, d)
    except OSError:
        # a concurrent session won the rename race — read its copy
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(d), "store"


def drop_models(name: str, spark=None) -> None:
    """Remove every stored artifact of one model family — the bench
    cold-path clear (cold must price the FIT, not a store load)."""
    root = store_root(spark)
    if root is None:
        return
    shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def prune_models(max_age_days: float = 30.0, spark=None, *, now: float | None = None) -> int:
    """Garbage-collect stale artifacts: a regenerated fixture or a conf
    change mints a NEW key hash and the old directory becomes dead
    weight — never wrong (nothing resolves to it) but unbounded. Drop
    every artifact whose newest file is older than ``max_age_days``.
    Returns the number of artifact directories removed. ``now`` is an
    explicit epoch-seconds clock for deterministic tests; the load path
    refreshes nothing, so age == time since the artifact was written."""
    import time as _time

    root = store_root(spark)
    if root is None or not os.path.isdir(root):
        return 0
    cutoff = (now if now is not None else _time.time()) - max_age_days * 86400
    removed = 0
    for name in sorted(os.listdir(root)):
        family = os.path.join(root, name)
        if not os.path.isdir(family):
            continue
        for h in sorted(os.listdir(family)):
            d = os.path.join(family, h)
            try:
                newest = max(
                    os.stat(os.path.join(dp, f)).st_mtime
                    for dp, _dn, fns in os.walk(d)
                    for f in fns
                )
            except ValueError:  # empty dir — a torn write; reap it
                newest = 0.0
            if newest < cutoff:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
    return removed
