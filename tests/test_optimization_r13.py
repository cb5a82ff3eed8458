"""Round-13 optimization internals: the zipimport mtime guard, the
session confs that carry the measured wins, and the CH-dialect
registration memo. Each test pins a behavior an optimization relies on,
so a regression is caught as a failure here rather than as a silent
bench slowdown."""

from __future__ import annotations

import os
import zipfile

import pytest


def test_mtime_guard_skips_unchanged_archive(tmp_path):
    """The pydaemon guard must skip the zip-directory re-read while the
    archive is unchanged and really re-read when it changes."""
    import zipimport

    from graphouse_spark import pydaemon

    zpath = tmp_path / "mod.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("m_opt13/__init__.py", "VALUE = 1\n")
    zi = zipimport.zipimporter(str(zpath))

    calls = []
    orig = pydaemon._orig_invalidate

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        pydaemon._orig_invalidate = counting
        pydaemon._mtime_guarded_invalidate(zi)
        assert len(calls) == 1  # first call always re-reads
        pydaemon._mtime_guarded_invalidate(zi)
        pydaemon._mtime_guarded_invalidate(zi)
        assert len(calls) == 1  # unchanged mtime: skipped
        # change the archive (content + mtime)
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("m_opt13/__init__.py", "VALUE = 2\n")
        os.utime(zpath, (os.path.getmtime(zpath) + 5,) * 2)
        pydaemon._mtime_guarded_invalidate(zi)
        assert len(calls) == 2  # changed: re-read
    finally:
        pydaemon._orig_invalidate = orig


def test_session_carries_optimization_confs(spark):
    """The measured wins live in these confs; a session built without
    them silently reverts to the slow paths."""
    conf = spark.conf
    assert conf.get("spark.python.daemon.module") == "graphouse_spark.pydaemon"
    assert conf.get("spark.shuffle.sort.bypassMergeThreshold") == "1"
    assert conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    # the daemon import must survive a foreign driver cwd
    assert "graphouse_spark" in __import__("graphouse_spark").__file__
    pythonpath = conf.get("spark.executorEnv.PYTHONPATH")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(
        __import__("graphouse_spark").__file__)))
    assert pythonpath.split(":")[0] == pkg_root


def test_fast_function_lookup_installed(spark):
    import pyspark.sql.functions.builtin as builtin

    assert getattr(builtin, "_gs_cached_lookup", False)
    # the memo must key per-context and actually populate
    from pyspark.sql import functions as F

    F.lit(1)
    sc = spark.sparkContext
    assert "_gs_jvm_fn_cache" in sc.__dict__ and sc.__dict__["_gs_jvm_fn_cache"]


def test_ch_dialect_registers_once_per_session(spark, monkeypatch):
    from graphouse_spark import chdialect

    n1 = chdialect.register_ch_dialect(spark)
    assert n1 > 0
    # a second call must not re-run the DDL
    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("re-registered despite memo")

    monkeypatch.setattr(spark, "sql", boom)
    assert chdialect.register_ch_dialect(spark) == n1
    # force really re-runs (and needs the real spark.sql back)
    monkeypatch.undo()
    assert chdialect.register_ch_dialect(spark, force=True) == n1
    # the shims must actually resolve after the memoized path
    assert spark.sql("SELECT toYear(0) AS v").collect()[0].v == 1970


@pytest.mark.parametrize("text", [None, "", "a", "Hello World Hello",
                                  "Ünïcode tæxt with nbsp inside"])
def test_kernel_memo_bit_identity(spark, text):
    """The per-task md5 memo + digest-bytes form must stay bit-identical
    to the engine (Catalyst md5) twins on edge-shaped inputs."""
    from pyspark.sql import Row

    from graphouse_spark.functions.dedup import (
        minhash_signatures, minhash_signatures_np, simhash, simhash_np)

    docs = spark.createDataFrame([Row(doc_id=1, text=text),
                                  Row(doc_id=2, text="shared tokens shared")])
    eng = {r.doc_id: r.signature for r in
           minhash_signatures(docs, hash_fn="md5").collect()}
    np_ = {r.doc_id: r.signature for r in minhash_signatures_np(docs).collect()}
    assert eng == np_
    eng_s = {r.doc_id: r.simhash for r in simhash(docs, bits=60, hash_fn="md5").collect()}
    np_s = {r.doc_id: r.simhash for r in simhash_np(docs, bits=60).collect()}
    assert eng_s == np_s
