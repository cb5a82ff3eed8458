"""PySpark worker daemon with CPython-3.12-style zipimport caching.

Every Python task's worker bootstrap calls ``importlib.invalidate_caches()``
(``pyspark/worker_util.py::setup_spark_files``) so that py-files added at
runtime become importable. On Python 3.11, ``zipimporter.invalidate_caches``
EAGERLY re-reads the whole zip central directory — and the workers import
pyspark from ``$SPARK_HOME/python/lib/pyspark.zip`` (thousands of entries),
so every task pays ~0.3-0.4 s of CPU re-parsing a zip directory that never
changes. Measured on this engine (local[32], Spark 4.1.2, Python 3.11): a
TRIVIAL 32-task mapInPandas stage costs ~13 s of executor task time per run,
~0.4 s/task, >95% of it in ``zipimport._read_directory``; with this daemon
the same stage is ~0.5 s of task time. At cluster scale the waste is
tasks x 0.3 s of pure CPU on every Python-boundary stage.

The fix backports the newer-CPython semantics: skip the re-read while the
archive's mtime is unchanged, really re-read when it changes (so late
``addPyFile`` of a zip still works). Applied in the daemon process BEFORE
any fork, so every worker inherits it and even the first task per worker is
fast.

Activated by ``spark.python.daemon.module=graphouse_spark.pydaemon`` (a
stock Spark conf, set in session.get_spark); REQUIRES this package to be
importable by the worker Python. There is no automatic fallback: if the
worker Python cannot import this module, PythonWorkerFactory fails the
task outright rather than running the stock daemon. get_spark only sets
the conf for its own ``local[...]`` master (where the PYTHONPATH it also
sets makes the package importable by construction); cluster deploys must
ship the package to executors before opting in — ``cluster_conf()``
deliberately does not include it.
"""

from __future__ import annotations

import os
import zipimport

_orig_invalidate = zipimport.zipimporter.invalidate_caches


def _mtime_guarded_invalidate(self) -> None:  # type: ignore[no-untyped-def]
    try:
        mtime = os.path.getmtime(self.archive)
    except OSError:
        mtime = None
    if mtime is not None and getattr(self, "_gs_zip_mtime", None) == mtime:
        return  # archive unchanged: the cached directory is still valid
    self._gs_zip_mtime = mtime
    _orig_invalidate(self)


def install() -> None:
    zipimport.zipimporter.invalidate_caches = _mtime_guarded_invalidate


if __name__ == "__main__":
    install()
    from pyspark.daemon import manager

    manager()
