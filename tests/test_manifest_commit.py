"""Round-12 verdict #1: the rollup partition commit SERVES rename-less
stores through the generation + pointer-commit protocol
(graphouse_spark/manifest.py) instead of refusing them.

The suite forces a local table onto the manifest path by shrinking
RENAME_ATOMIC_SCHEMES (the scheme gate every protocol branch reads
dynamically), injects a crash at every protocol step, and asserts
query results are BYTE-IDENTICAL to the rename-protocol twin across
each one."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from graphouse_spark import fs as fs_mod
from graphouse_spark import manifest as mf
from graphouse_spark.operators.rollup import (
    compact_data_table, recover_compaction)
from graphouse_spark.sources.tables import read_data, write_data
from tests.test_read_path import make_data
from tests.test_rollup import BASE, NOW, PROVIDER, old_points


@pytest.fixture
def no_rename(monkeypatch):
    """Force every protocol branch onto the manifest path: the local
    filesystem no longer counts as rename-atomic (stand-in for s3a/gs,
    where Fs.rename refuses and commits must pointer-flip)."""
    monkeypatch.setattr(fs_mod, "RENAME_ATOMIC_SCHEMES",
                        frozenset({"hdfs", "viewfs"}))


def rows_of(spark, path):
    """Full table contents, canonically ordered — the byte-identity
    oracle across crash points and against the rename-protocol twin."""
    return sorted(
        map(tuple, read_data(spark, path).collect()),
        key=lambda t: (t[0], t[2], t[3]),
    )


def fresh_points(spark):
    return make_data(spark, [("one_min.srv.cpu", 5.0, NOW - 30, 1),
                             ("one_min.srv.cpu", 7.0, NOW - 90, 1)])


def test_manifest_compaction_matches_rename_protocol(spark, tmp_path,
                                                     no_rename,
                                                     monkeypatch):
    """End to end: same input, one table compacted via the manifest
    protocol, its twin via the rename protocol — byte-identical
    contents, and the manifest table never renames a directory."""
    man_path = str(tmp_path / "man")
    twin_path = str(tmp_path / "twin")
    pts = old_points(spark).unionByName(fresh_points(spark))
    write_data(pts, man_path)
    write_data(pts, twin_path)

    def boom(*a, **kw):
        raise AssertionError("manifest protocol must never rename")

    with monkeypatch.context() as m:
        m.setattr(fs_mod.Fs, "rename", boom)
        rewritten = compact_data_table(spark, man_path, PROVIDER,
                                       now_seconds=NOW,
                                       min_age_seconds=7 * 86400)
    assert rewritten == ["2018-11-14"]
    # the twin runs the (unpatched-set) rename protocol
    with monkeypatch.context() as m:
        m.setattr(fs_mod, "RENAME_ATOMIC_SCHEMES",
                  frozenset({"file", "hdfs", "viewfs"}))
        assert compact_data_table(spark, twin_path, PROVIDER,
                                  now_seconds=NOW,
                                  min_age_seconds=7 * 86400) == ["2018-11-14"]
    assert rows_of(spark, man_path) == rows_of(spark, twin_path)

    # namespace state: old root partition UNTOUCHED on disk (dead but
    # excluded), committed rows in a dot-hidden generation, one pointer
    assert os.path.isdir(f"{man_path}/date=2018-11-14")
    man = json.loads(open(f"{man_path}/{mf.TABLE_MANIFEST}").read())
    gen = man["partitions"]["2018-11-14"]["generation"]
    assert gen.startswith(".gen-") and os.path.isdir(
        f"{man_path}/{gen}/date=2018-11-14")
    assert man["partitions"]["2018-11-14"]["replaced"]
    # legacy namespace readers of the root see only non-hidden dirs —
    # they'd double-read dead files, which is exactly why reads go
    # through read_data; the RESOLVED read is the contract
    assert read_data(spark, man_path).filter(
        F.col("date") == "2018-11-14").count() == 2

    # idempotent: second run converges (and sweeps run-1's dead files,
    # aged past the grace window by the later now)
    compact_data_table(spark, man_path, PROVIDER, now_seconds=NOW + 7200,
                       min_age_seconds=7 * 86400)
    assert rows_of(spark, man_path) == rows_of(spark, twin_path)
    assert not os.path.exists(
        f"{man_path}/date=2018-11-14")  # dead legacy dir swept


def test_manifest_crash_at_every_step(spark, tmp_path, no_rename,
                                      monkeypatch):
    """Inject a crash at each protocol step; after every one the table
    reads byte-identically to its pre-compaction contents (pre-flip
    crashes) or its compacted contents (post-flip crashes), and the
    next run converges."""
    path = str(tmp_path / "data")
    write_data(old_points(spark).unionByName(fresh_points(spark)), path)
    before = rows_of(spark, path)

    # -- crash DURING the generation write (partial gen dir, no
    # manifest): readers unaffected, recovery sweeps it once aged --
    os.makedirs(f"{path}/.gen-{NOW - 7200:012d}-deadbeef/date=2018-11-14")
    shutil.copy(
        next(f"{path}/date=2018-11-14/" + f
             for f in os.listdir(f"{path}/date=2018-11-14")
             if f.endswith(".parquet")),
        f"{path}/.gen-{NOW - 7200:012d}-deadbeef/date=2018-11-14/part-0.parquet")
    assert rows_of(spark, path) == before
    recover_compaction(path)  # no manifest yet -> nothing to sweep, no-op
    assert os.path.isdir(f"{path}/.gen-{NOW - 7200:012d}-deadbeef")

    # -- crash AT the pointer write (manifest write raises): compaction
    # fails, reads unchanged, rerun succeeds --
    real_write = mf.write_table_manifest

    def torn(fs, root, man):
        raise OSError("injected crash at pointer write")

    with monkeypatch.context() as m:
        m.setattr(mf, "write_table_manifest", torn)
        with pytest.raises(OSError, match="injected crash"):
            compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                               min_age_seconds=7 * 86400)
    assert rows_of(spark, path) == before
    assert not os.path.exists(f"{path}/{mf.TABLE_MANIFEST}")

    # -- clean commit; crash BEFORE the GC sweep is the committed state
    # itself (commit-time GC keeps everything younger than grace) --
    assert compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                              min_age_seconds=7 * 86400) == ["2018-11-14"]
    compacted = rows_of(spark, path)
    assert os.path.isdir(f"{path}/date=2018-11-14")  # dead, unswept
    # the aged orphan generation from the first injected crash is gone
    assert not os.path.exists(f"{path}/.gen-{NOW - 7200:012d}-deadbeef")

    # -- crash MID-GC: some dead files already deleted, manifest not
    # yet rewritten; reads unchanged, sweep converges --
    fs = fs_mod.get_fs(path, spark)
    man = mf.read_table_manifest(fs, path)
    dead = man["pending_gc"][0]["paths"]
    os.remove(f"{path}/{dead[0]}")
    crc = os.path.join(os.path.dirname(f"{path}/{dead[0]}"),
                       "." + os.path.basename(dead[0]) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert rows_of(spark, path) == compacted
    man = mf.gc_data_manifest(fs, path, man, now=NOW + 7200)
    assert rows_of(spark, path) == compacted
    assert man["pending_gc"] == []
    for rel in dead:
        assert not os.path.exists(f"{path}/{rel}")
    # replaced entries for swept files were pruned with the sweep
    assert man["partitions"]["2018-11-14"]["replaced"] == []

    # -- recovery entry point is the same idempotent sweep --
    assert recover_compaction(path) == []
    assert rows_of(spark, path) == compacted


def test_manifest_append_after_compaction(spark, tmp_path, no_rename):
    """A streaming append to an ALREADY-COMPACTED date is visible
    immediately (it lands at the root, outside every replaced list)
    and the next compaction absorbs it into a new generation."""
    path = str(tmp_path / "data")
    write_data(old_points(spark), path)
    assert compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                              min_age_seconds=7 * 86400) == ["2018-11-14"]
    fs = fs_mod.get_fs(path, spark)
    gen1 = mf.read_table_manifest(fs, path)["partitions"]["2018-11-14"][
        "generation"]

    late = make_data(spark, [("one_min.srv.cpu", 42.0, BASE + 600, 9)])
    write_data(late, path)
    got = read_data(spark, path).filter(F.col("value") == 42.0).count()
    assert got == 1  # visible alongside the rolled rows

    # next run rolls the late point into a fresh generation and
    # repoints; the old generation ages out once unreferenced
    assert compact_data_table(spark, path, PROVIDER,
                              now_seconds=NOW + 7200,
                              min_age_seconds=7 * 86400) == ["2018-11-14"]
    man = mf.read_table_manifest(fs, path)
    gen2 = man["partitions"]["2018-11-14"]["generation"]
    assert gen2 != gen1
    vals = {r["value"] for r in read_data(spark, path)
            .filter(F.col("date") == "2018-11-14").collect()}
    assert 42.0 in vals  # late point present in the rolled bucket set
    # one more sweep far in the future drops the unreferenced gen1
    mf.gc_data_manifest(fs, path, man, now=NOW + 10 * 86400)
    assert not os.path.exists(f"{path}/{gen1}")
    assert os.path.isdir(f"{path}/{gen2}")


def test_zonemap_file_listing_resolves_manifest(spark, tmp_path,
                                                no_rename):
    """The zonemap/bloom file lister must see generation files and
    must NOT see replaced-but-unswept root files — a namespace listing
    would do the opposite."""
    from graphouse_spark.sources.skipping import _data_files

    path = str(tmp_path / "data")
    write_data(old_points(spark), path)
    compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                       min_age_seconds=7 * 86400)
    files = _data_files(path, spark)
    assert files, "resolver returned nothing"
    assert all("/.gen-" in f for f in files)
    assert not any("/date=2018-11-14/" in f and "/.gen-" not in f
                   for f in files)


def test_unreadable_manifest_refuses(spark, tmp_path, no_rename):
    """A pointer that exists but cannot be parsed must refuse the read
    (serving the namespace layout could double-read replaced files)."""
    path = str(tmp_path / "data")
    write_data(old_points(spark), path)
    compact_data_table(spark, path, PROVIDER, now_seconds=NOW,
                       min_age_seconds=7 * 86400)
    fs = fs_mod.get_fs(path, spark)
    fs.write_text(f"{path}/{mf.TABLE_MANIFEST}", "{torn")
    with pytest.raises(RuntimeError, match="unreadable table manifest"):
        read_data(spark, path).count()
