"""Round-14 optimization internals.

Pins the r13/r14 optimizer monkeypatches against pyspark drift
(round-13 verdict #5/#9): both patches target private pyspark symbols
that would silently no-op (fast path lost) or need re-porting on a
pyspark upgrade. These tests fail LOUDLY when the patched symbol
disappears or stops being the one pyspark actually calls, instead of
the regression surfacing as an unexplained bench slowdown.
"""

from __future__ import annotations

import pytest


def test_get_jvm_function_symbol_still_exists():
    """session._install_fast_function_lookup patches
    ``pyspark.sql.functions.builtin._get_jvm_function``. If a pyspark
    upgrade renames or removes it, the install silently returns and
    every F.<fn> call goes back to ~13 py4j round trips (measured
    2.3 ms/call). Fail loudly instead."""
    import pyspark.sql.functions.builtin as builtin

    fn = getattr(builtin, "_get_jvm_function", None)
    assert callable(fn), (
        "pyspark.sql.functions.builtin._get_jvm_function disappeared — "
        "re-port graphouse_spark.session._install_fast_function_lookup "
        "to the new pyspark layout or drop the optimization knowingly")


def test_fast_lookup_wraps_the_symbol_pyspark_calls(spark):
    """The memoized wrapper must be the function the F.<fn> path
    actually invokes — a pyspark refactor that binds the original by
    value elsewhere would leave our patch installed but dead."""
    import pyspark.sql.functions.builtin as builtin

    assert getattr(builtin, "_gs_cached_lookup", False)
    sc = spark.sparkContext
    sc.__dict__.pop("_gs_jvm_fn_cache", None)
    from pyspark.sql import functions as F

    F.sha1(F.lit("x"))  # any builtin routed through _invoke_function_over_columns
    cache = sc.__dict__.get("_gs_jvm_fn_cache")
    assert cache, (
        "F.<fn> no longer routes through the patched _get_jvm_function — "
        "the fast-lookup optimization is installed but dead")


def test_daemon_conf_still_honored_by_pyspark():
    """The zipimport fix rides on ``spark.python.daemon.module`` being
    read by PythonWorkerFactory. Pin the conf key's continued existence
    in the pyspark distribution (the behavior itself is pinned by
    test_optimization_r13.test_mtime_guard_skips_unchanged_archive and
    the session conf test)."""
    import glob
    import os

    import pyspark

    # the conf is read JVM-side; check the shipped jars reference it
    home = os.path.dirname(pyspark.__file__)
    jars = glob.glob(os.path.join(home, "jars", "spark-core_*.jar"))
    assert jars, "pyspark layout changed: spark-core jar not found"
    import zipfile

    found = False
    with zipfile.ZipFile(jars[0]) as z:
        for n in z.namelist():
            if "PythonWorkerFactory" in n:
                found = True
                break
    assert found, (
        "PythonWorkerFactory disappeared from spark-core — re-verify "
        "spark.python.daemon.module is still honored before trusting "
        "the pydaemon optimization")


def test_paired_remeasure_adjudicates_on_min_growth_pair(monkeypatch):
    """r14 gate hardening #2 (scale_check.paired_remeasure): a
    throttled window during ONE pair's big side must not read as plan
    growth — the min-growth pair adjudicates — while uniform (real)
    growth survives every pair and still fails. Probes are pinned so
    only the pairing logic is under test; a Spark session is not
    needed (the gc call is satisfied by a stub)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import scale_check

    monkeypatch.setattr(scale_check, "host_probe",
                        lambda spark, meter: {"task_sec": 1.0,
                                              "cpu_sec": 1.0})
    monkeypatch.setattr(scale_check.time, "sleep", lambda s: None)

    class _Stub:
        def __getattr__(self, name):
            return _Stub()

        def __call__(self, *a, **kw):
            return None

    spark = _Stub()

    # box throttles during pairs 1 and 3; pair 2 lands steady
    smalls = iter([{"task_sec": 1.0, "cpu_sec": 1.0}] * 3)
    bigs = iter([{"task_sec": 30.0, "cpu_sec": 30.0},
                 {"task_sec": 5.0, "cpu_sec": 5.0},
                 {"task_sec": 28.0, "cpu_sec": 29.0}])
    small, big = scale_check.paired_remeasure(
        spark, None, lambda: next(smalls), lambda: next(bigs))
    growth = min(big["task_sec"] / small["task_sec"],
                 big["cpu_sec"] / small["cpu_sec"])
    assert growth == 5.0, (small, big)

    # a REAL superlinear plan inflates EVERY pair: min still fails
    smalls = iter([{"task_sec": 1.0, "cpu_sec": 1.0}] * 3)
    bigs = iter([{"task_sec": 30.0, "cpu_sec": 31.0}] * 3)
    small, big = scale_check.paired_remeasure(
        spark, None, lambda: next(smalls), lambda: next(bigs))
    growth = min(big["task_sec"] / small["task_sec"],
                 big["cpu_sec"] / small["cpu_sec"])
    assert growth == 30.0, (small, big)
