"""Unit suite for the Hadoop-FS commit primitives (graphouse_spark/fs.py)
— the seam every storage protocol (rollup swap, tag rewrite, mutations,
metrics compaction, export manifest) runs through since round 12."""

import os

import pytest

from graphouse_spark.fs import (
    Fs,
    abspath,
    base_name,
    get_fs,
    parent_dir,
    recover_swap,
)


def test_path_helpers():
    assert parent_dir("/a/b/c") == "/a/b"
    assert parent_dir("/a") == "/"
    assert base_name("/a/b/c/") == "c"
    assert parent_dir("hdfs://nn/a/b") == "hdfs://nn/a"
    assert base_name("hdfs://nn/a/b") == "b"
    assert abspath("hdfs://nn/a") == "hdfs://nn/a"
    assert os.path.isabs(abspath("rel/path"))


def test_verbs_and_norm(spark, tmp_path):
    d = str(tmp_path)
    fs = get_fs(d, spark)
    assert fs.scheme == "file"
    fs.mkdirs(f"{d}/x/y")
    assert fs.exists(f"{d}/x/y") and fs.is_dir(f"{d}/x")
    assert fs.listdir(f"{d}/x") == ["y"]
    assert fs.listdir(f"{d}/missing") == []
    # scheme-less instance: listing style is plain paths; a qualified
    # root yields qualified URIs — norm() maps any input to the style
    assert fs.norm(f"file://{d}/x") == f"{d}/x"
    fq = get_fs(f"file://{d}", spark)
    assert fq.norm(f"{d}/x") == f"file://{d}/x"
    # rename refuses an existing target (Hadoop mv-into semantics trap)
    fs.mkdirs(f"{d}/a")
    fs.mkdirs(f"{d}/b")
    with pytest.raises(FileExistsError):
        fs.rename(f"{d}/a", f"{d}/b")
    fs.rename(f"{d}/a", f"{d}/c")
    assert not fs.exists(f"{d}/a") and fs.exists(f"{d}/c")
    # delete: recursive, missing path is not an error
    assert fs.delete(f"{d}/x") is True
    assert fs.delete(f"{d}/x") is False


def test_list_files_skips_hidden_dirs(spark, tmp_path):
    """The Spark visibility rule: files under a dot/underscore-hidden
    directory are invisible too — a staged .date=*.new partition must
    never leak into a zonemap or size audit."""
    d = str(tmp_path)
    os.makedirs(f"{d}/date=2024-01-01")
    os.makedirs(f"{d}/.date=2024-01-01.new")
    os.makedirs(f"{d}/_tmp")
    for p, name in [(f"{d}/date=2024-01-01", "a.parquet"),
                    (f"{d}/date=2024-01-01", "_meta.parquet"),
                    (f"{d}/.date=2024-01-01.new", "b.parquet"),
                    (f"{d}/_tmp", "c.parquet")]:
        with open(f"{p}/{name}", "w") as fh:
            fh.write("x")
    fs = get_fs(d, spark)
    visible = [p for p, _ in fs.list_files(d)]
    assert visible == [f"{d}/date=2024-01-01/a.parquet"]
    everything = [p for p, _ in fs.list_files(d, suffix="", hidden=True)]
    assert len(everything) == 4


def test_list_files_retries_when_path_vanishes_mid_walk(spark, tmp_path):
    """A concurrent Spark commit creates and deletes _temporary scratch
    under a live dir while rewrite_tags_atomic's snapshot listing walks
    it (the snapshot deliberately runs outside the append lock); the
    recursive RemoteIterator then throws from hasNext when an entry it
    is about to stat disappears. list_files must re-list and converge
    instead of surfacing the transient error (reproduced as a rare
    in-suite flake of test_write_tags_appends_serialize_with_rewrite)."""
    from py4j.protocol import Py4JJavaError

    d = str(tmp_path)
    with open(f"{d}/a.parquet", "w") as fh:
        fh.write("x")
    fs = get_fs(d, spark)
    real_jfs = fs._fs
    calls = {"n": 0}

    class _BoomIter:
        def hasNext(self):
            jexc = spark._jvm.java.io.FileNotFoundException(
                "vanished mid-walk (simulated)")
            raise Py4JJavaError("An error occurred while calling hasNext.\n",
                                jexc)

    class _FlakyJfs:
        def __getattr__(self, name):
            return getattr(real_jfs, name)

        def listFiles(self, jroot, recursive):
            calls["n"] += 1
            if calls["n"] == 1:
                return _BoomIter()
            return real_jfs.listFiles(jroot, recursive)

    fs._fs = _FlakyJfs()
    try:
        out = [p for p, _ in fs.list_files(d)]
    finally:
        fs._fs = real_jfs
    assert calls["n"] == 2
    assert out == [f"{d}/a.parquet"]

    # a non-vanished-path Java error must NOT be swallowed or retried
    class _FatalIter:
        def hasNext(self):
            jexc = spark._jvm.java.lang.IllegalStateException("broken fs")
            raise Py4JJavaError("An error occurred while calling hasNext.\n",
                                jexc)

    class _FatalJfs:
        def __getattr__(self, name):
            return getattr(real_jfs, name)

        def listFiles(self, jroot, recursive):
            calls["n"] += 1
            return _FatalIter()

    calls["n"] = 0
    fs._fs = _FatalJfs()
    try:
        with pytest.raises(Py4JJavaError):
            fs.list_files(d)
    finally:
        fs._fs = real_jfs
    assert calls["n"] == 1


def test_write_read_text_roundtrip(spark, tmp_path):
    d = str(tmp_path)
    fs = get_fs(d, spark)
    fs.write_text(f"{d}/ptr.json", '{"gen": "g1"}')
    assert fs.read_text(f"{d}/ptr.json") == '{"gen": "g1"}'
    fs.write_text(f"{d}/ptr.json", '{"gen": "g2"}')  # overwrite commits
    assert fs.read_text(f"{d}/ptr.json") == '{"gen": "g2"}'
    # unicode survives the JVM round trip
    fs.write_text(f"{d}/u.txt", "héllo — 世界")
    assert fs.read_text(f"{d}/u.txt") == "héllo — 世界"


def test_nonatomic_rename_refused(spark, tmp_path, monkeypatch):
    """Renames on schemes without atomic rename must refuse loudly —
    the protocols would otherwise half-apply on S3. The env override
    exists for single-writer dev runs."""
    d = str(tmp_path)
    fs = get_fs(d, spark)
    monkeypatch.setattr(fs, "scheme", "s3a")
    monkeypatch.delenv("GRAPHOUSE_ALLOW_NONATOMIC_RENAME", raising=False)
    fs.mkdirs(f"{d}/src")
    with pytest.raises(NotImplementedError, match="manifest commit"):
        fs.rename(f"{d}/src", f"{d}/dst")
    monkeypatch.setenv("GRAPHOUSE_ALLOW_NONATOMIC_RENAME", "1")
    fs.rename(f"{d}/src", f"{d}/dst")
    assert fs.exists(f"{d}/dst")


@pytest.mark.parametrize("state", range(8))
def test_recover_swap_every_state(spark, tmp_path, state):
    """Exhaustive three-path state machine: for every combination of
    (stage, live, bak) existence the recovery ends with a usable live
    dir whenever ANY copy existed, and never leaves stage/bak behind."""
    d = str(tmp_path)
    fs = get_fs(d, spark)
    has_stage, has_live, has_bak = bool(state & 4), bool(state & 2), bool(state & 1)
    live, stage, bak = f"{d}/live", f"{d}/stage", f"{d}/bak"
    # distinguishable contents: which copy survives is part of the spec
    if has_stage:
        fs.mkdirs(stage)
        with open(f"{stage}/marker", "w") as fh:
            fh.write("stage")
    if has_live:
        fs.mkdirs(live)
        with open(f"{live}/marker", "w") as fh:
            fh.write("live")
    if has_bak:
        fs.mkdirs(bak)
        with open(f"{bak}/marker", "w") as fh:
            fh.write("bak")

    recover_swap(fs, live, stage, bak)

    # protocol dirs never survive recovery
    assert not fs.exists(stage) and not fs.exists(bak)
    if not (has_live or has_bak):
        # nothing, or an orphan stage with no context: dropped — the
        # rerun rebuilds it; there is no copy to promote to live
        assert not fs.exists(live)
        return
    assert fs.exists(live)
    content = open(f"{live}/marker").read()
    if has_live:
        # an existing live dir always wins (the swap either never
        # started or already completed)
        assert content == "live"
    elif has_stage:
        # stage + bak, no live — crashed between the two renames:
        # roll FORWARD to the stage
        assert content == "stage"
    else:
        assert content == "bak"  # restore the original


def test_recover_swap_orphan_stage_dropped(spark, tmp_path):
    d = str(tmp_path)
    fs = get_fs(d, spark)
    fs.mkdirs(f"{d}/stage")
    assert recover_swap(fs, f"{d}/live", f"{d}/stage", f"{d}/bak") \
        == "dropped-orphan-stage"
    assert not fs.exists(f"{d}/live") and not fs.exists(f"{d}/stage")
