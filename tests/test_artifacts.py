"""Artifact-store lifecycle (VERDICT r5 item 7): input fingerprints in
the cache key (a mutated corpus can never be served a stale artifact)
and the ``base_dir`` deployment hook."""
from __future__ import annotations

import os
import shutil
import tempfile

from data_engineer_interview_task_spark.plans import artifacts


def _build_counter(spark, tag):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.createDataFrame([(1, tag)], "id long, tag string")

    return calls, build


def test_mutated_input_triggers_rebuild(spark, sf_dir):
    # a private mutable copy of one corpus table
    src = os.path.join(sf_dir, "documents.parquet")
    work = tempfile.mkdtemp(prefix="artifact-input-")
    copy = os.path.join(work, "documents.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, copy)
        mutate_target = os.path.join(
            copy, sorted(f for f in os.listdir(copy) if not f.startswith("."))[0]
        )
    else:
        shutil.copy(src, copy)
        mutate_target = copy

    calls, build = _build_counter(spark, "v1")
    key = ("test_fp_rebuild", work)
    df1 = artifacts.materialized(spark, key, "test_art_", build, inputs=(copy,))
    assert df1.count() == 1 and calls["n"] == 1
    # same key + unchanged input -> served from cache, no rebuild
    artifacts.materialized(spark, key, "test_art_", build, inputs=(copy,)).count()
    assert calls["n"] == 1
    # in-place mutation (append a byte -> size+mtime both move)
    with open(mutate_target, "ab") as f:
        f.write(b"\x00")
    artifacts.materialized(spark, key, "test_art_", build, inputs=(copy,)).count()
    assert calls["n"] == 2, "mutated input must invalidate the cached artifact"
    shutil.rmtree(work)


def test_restart_reuses_finished_artifact_and_prunes_superseded(spark):
    """ADVICE r6: deterministic hash-named dirs + completion marker mean
    a process restart (simulated by clearing the in-memory cache) scans
    the finished artifact instead of rebuilding, and a fingerprint
    change deletes the superseded dir after the replacement lands."""
    base = tempfile.mkdtemp(prefix="artifact-persist-")
    work = tempfile.mkdtemp(prefix="artifact-input-")
    inp = os.path.join(work, "in.bin")
    with open(inp, "wb") as f:
        f.write(b"v1")
    calls, build = _build_counter(spark, "persist")
    key = ("test_restart_reuse",)
    artifacts.materialized(
        spark, key, "test_art_", build, inputs=(inp,), base_dir=base
    ).count()
    assert calls["n"] == 1
    # simulated restart: in-memory cache gone, on-disk artifact remains
    artifacts._CACHE.clear()
    artifacts.materialized(
        spark, key, "test_art_", build, inputs=(inp,), base_dir=base
    ).count()
    assert calls["n"] == 1, "restart must reuse the finished artifact"
    assert len(os.listdir(base)) == 1
    # input mutation: rebuild; a FRESH superseded dir is RETAINED for the
    # prune grace window (ADVICE r7 — a concurrent process may still hold
    # it in its cache) ...
    with open(inp, "ab") as f:
        f.write(b"\x00")
    artifacts.materialized(
        spark, key, "test_art_", build, inputs=(inp,), base_dir=base
    ).count()
    assert calls["n"] == 2
    assert len(os.listdir(base)) == 2, (
        "fresh superseded artifact must survive the prune grace window"
    )
    # ... and is pruned once older than the grace window: backdate the
    # superseded dir, trigger one more fingerprint change
    import time as _time

    old = _time.time() - artifacts._PRUNE_GRACE_SEC - 60
    for d in os.listdir(base):
        os.utime(os.path.join(base, d), (old, old))
    with open(inp, "ab") as f:
        f.write(b"\x00")
    artifacts.materialized(
        spark, key, "test_art_", build, inputs=(inp,), base_dir=base
    ).count()
    assert calls["n"] == 3
    assert len(os.listdir(base)) == 1, (
        "superseded artifacts past the grace window must be pruned"
    )
    # torn write (marker missing) is rebuilt in place on next access
    artifacts._CACHE.clear()
    art = os.path.join(base, os.listdir(base)[0])
    os.remove(os.path.join(art, artifacts._MARKER))
    artifacts.materialized(
        spark, key, "test_art_", build, inputs=(inp,), base_dir=base
    ).count()
    assert calls["n"] == 4, "missing completion marker must force rebuild"
    shutil.rmtree(base)
    shutil.rmtree(work)


def test_base_dir_places_artifacts(spark):
    base = tempfile.mkdtemp(prefix="artifact-base-")
    calls, build = _build_counter(spark, "based")
    artifacts.materialized(
        spark, ("test_base_dir",), "test_art_", build, base_dir=base
    ).count()
    assert calls["n"] == 1
    subdirs = [d for d in os.listdir(base) if d.startswith("test_art_")]
    assert subdirs, "artifact must land under base_dir"
    shutil.rmtree(base)
