"""sources.fs — the scheme-dispatched small-file primitives every
manifest/commit protocol in the engine rides on (round-10 verdict #1:
the streaming index merge must not depend on driver-local ``os.*``).

Both branches are exercised: bare paths (the local fast path) and
``file://`` URIs, which force the Hadoop ``FileSystem`` branch through
the JVM gateway — the exact code path an ``hdfs://`` or ``s3a://`` root
takes on a real cluster, minus only the store's network."""

from __future__ import annotations

import os

import pytest

from tf_idf_mapreduce_spark.sources import fs


def _roots(tmp_path, spark):
    local = str(tmp_path / "local")
    os.makedirs(local)
    remote = f"file://{tmp_path}/remote"
    fs.makedirs(remote, spark)
    return [("local", local), ("hadoop", remote)]


def test_scheme_detection():
    assert not fs._is_remote("/plain/path")
    assert not fs._is_remote("relative/path")
    # a Windows drive letter is NOT a scheme
    assert not fs._is_remote("C:/Users/x")
    assert fs._is_remote("file:///tmp/x")
    assert fs._is_remote("hdfs://nn/x")
    assert fs._is_remote("s3a://bucket/x")
    assert fs._local("file:///tmp/x") == "/tmp/x"
    assert fs._local("file:/tmp/x") == "/tmp/x"
    assert fs._local("/tmp/x") == "/tmp/x"


def test_join_keeps_scheme():
    assert fs.join("s3a://b/root", "seg_v1") == "s3a://b/root/seg_v1"
    assert fs.join("/a/b/", "manifest", "v3") == "/a/b/manifest/v3"


@pytest.mark.parametrize("branch", ["local", "hadoop"])
def test_put_read_list_delete_roundtrip(spark, tmp_path, branch):
    root = dict(_roots(tmp_path, spark))[branch]
    p = fs.join(root, "manifest", "v0")
    fs.makedirs(fs.join(root, "manifest"), spark)
    # exclusive create: first writer wins, second sees False
    assert fs.put_text_exclusive(p, "alpha", spark) is True
    assert fs.put_text_exclusive(p, "beta", spark) is False
    assert fs.read_text(p, spark) == "alpha"
    # atomic overwrite
    fs.put_text_atomic(p, "gamma", spark)
    assert fs.read_text(p, spark) == "gamma"
    # list sees the one entry; a missing dir lists empty, reads None
    assert fs.list_names(fs.join(root, "manifest"), spark) == ["v0"]
    assert fs.list_names(fs.join(root, "absent"), spark) == []
    assert fs.read_text(fs.join(root, "absent", "x"), spark) is None
    # recursive delete of the prefix
    fs.delete_recursive(fs.join(root, "manifest"), spark)
    assert not fs.exists(fs.join(root, "manifest"), spark)
    assert fs.list_names(fs.join(root, "manifest"), spark) == []


@pytest.mark.parametrize("branch", ["local", "hadoop"])
def test_exclusive_create_races_single_winner(spark, tmp_path, branch):
    """N concurrent exclusive creators of one commit marker: exactly one
    wins — the store/stream commit protocols' only concurrency bet."""
    import threading

    root = dict(_roots(tmp_path, spark))[branch]
    p = fs.join(root, "winner")
    results = []
    barrier = threading.Barrier(6)

    def attempt(i):
        barrier.wait()
        results.append((i, fs.put_text_exclusive(p, f"writer-{i}", spark)))

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert fs.read_text(p, spark) == f"writer-{winners[0]}"


def test_no_directory_renames_in_protocol(tmp_path, monkeypatch):
    """The fs local branch must never rename/replace a DIRECTORY — the
    primitive object stores lack (the reason model_store's old protocol
    was retired). os.rename/os.replace are patched to raise for
    directories; every primitive still works."""
    import os as _os

    real_rename, real_replace = _os.rename, _os.replace

    def guard(fn):
        def inner(src, dst, *a, **k):
            if _os.path.isdir(src):
                raise AssertionError(f"directory rename: {src} -> {dst}")
            return fn(src, dst, *a, **k)

        return inner

    monkeypatch.setattr(_os, "rename", guard(real_rename))
    monkeypatch.setattr(_os, "replace", guard(real_replace))

    root = str(tmp_path / "noren")
    fs.makedirs(fs.join(root, "manifest"))
    assert fs.put_text_exclusive(fs.join(root, "manifest", "v1"), "a")
    fs.put_text_atomic(fs.join(root, "manifest", "v1"), "b")
    assert fs.read_text(fs.join(root, "manifest", "v1")) == "b"
    fs.delete_recursive(root)
    assert not fs.exists(root)


def test_verify_and_reap_reject_remote_roots(spark, tmp_path):
    """A remote store root must RAISE from verify/reap, not audit as an
    empty store (round-11 review finding): os.listdir on 'hdfs://...'
    would silently report zero artifacts with exit 0. file:// roots are
    local mounts and audit fine."""
    import pytest as _pytest

    from tf_idf_mapreduce_spark.sources.model_store import (
        reap_store,
        verify_store,
    )

    with _pytest.raises(ValueError, match="remote store root"):
        verify_store(root="hdfs://nn/models")
    with _pytest.raises(ValueError, match="remote store root"):
        reap_store(root="s3a://bucket/models")
    rep = verify_store(root=f"file://{tmp_path}")
    assert rep["artifacts"] == []  # empty local dir, not an error
