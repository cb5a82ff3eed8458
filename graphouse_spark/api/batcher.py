"""X6: dir-content request coalescing — DirContentBatcher re-expressed.

Parity: ``DirContentBatcher.java:62-201``. The reference serves
graphite-web's tree browsing from a lazy-loading metric tree; when many
concurrent requests each need one directory's children, it coalesces
them into one ClickHouse query per aggregation window instead of one
query per request. The same backpressure problem exists here when the
serving tier lazy-loads from the ``metrics`` table: every Spark job has
fixed scheduling cost, so 200 concurrent one-dir lookups should become
one 200-dir scan, not 200 scans.

Mechanics (mirroring the reference):
- FAST PATH: if a request permit is free, the request runs alone
  immediately (``DirContentBatcher.loadDirContent``: ``tryAcquire`` ->
  single-dir load). Coalescing only kicks in under contention.
- otherwise the caller joins the CURRENT PENDING BATCH — one future
  per distinct dir, so duplicate requests share a load. The first
  joiner schedules the batch to fire after ``batch_aggregation_ms``;
  a batch that reaches ``max_batch_size`` is sealed and a new one
  opened (``createNewBatchIfNeed``).
- the batch worker takes a permit (honoring ``max_parallel``), marks
  itself started (late joiners roll over to a fresh batch), runs ONE
  loader call for every queued dir, and resolves each future. Dirs the
  loader failed to return get the error, matching
  ``updateNotLoadedMetrics``.

:func:`load_dirs_content` is the loader for the metrics table: one
IN-filtered scan + read-time LWW finalization for any number of dirs —
the ClickHouse ``parent IN (...)`` query's Spark twin.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable, Dict, Hashable, Set


class DirContentBatcher:
    """Coalesce concurrent key lookups into batched loader calls.

    ``loader(keys: set) -> dict`` runs at most ``max_parallel`` times
    concurrently; under contention, requests aggregate for
    ``batch_aggregation_ms`` (up to ``max_batch_size`` distinct keys)
    and share one call.
    """

    def __init__(self, loader: Callable[[Set[Hashable]], Dict], *,
                 max_parallel: int = 4, max_batch_size: int = 100,
                 batch_aggregation_ms: int = 50) -> None:
        self._loader = loader
        self._semaphore = threading.Semaphore(max_parallel)
        self._max_batch_size = max_batch_size
        self._batch_ms = batch_aggregation_ms
        self._lock = threading.Lock()
        self._current: _Batch | None = None

    def load(self, key: Hashable):
        """Blocking lookup of one key's content (the servlet call shape)."""
        if self._semaphore.acquire(blocking=False):
            try:
                return self._loader({key})[key]
            finally:
                self._semaphore.release()
        return self._join_batch(key).result()

    def _join_batch(self, key: Hashable) -> Future:
        with self._lock:
            batch = self._current
            if batch is None or batch.started or batch.size() >= self._max_batch_size:
                batch = _Batch(self)
                self._current = batch
                threading.Timer(self._batch_ms / 1000.0, batch.run).start()
            return batch.add(key)

    def _reset_if_current(self, batch: "_Batch") -> None:
        with self._lock:
            if self._current is batch:
                self._current = None


class _Batch:
    def __init__(self, owner: DirContentBatcher) -> None:
        self._owner = owner
        self._requests: Dict[Hashable, Future] = {}
        self._req_lock = threading.Lock()
        self.started = False

    def size(self) -> int:
        return len(self._requests)

    def add(self, key: Hashable) -> Future:
        with self._req_lock:
            fut = self._requests.get(key)
            if fut is None:
                fut = self._requests[key] = Future()
            return fut

    def run(self) -> None:
        self._owner._semaphore.acquire()
        try:
            with self._req_lock:
                self.started = True  # late joiners roll to a fresh batch
            self._owner._reset_if_current(self)
            keys = set(self._requests)
            if not keys:
                return
            try:
                results = self._owner._loader(keys)
            except Exception as e:  # propagate to every waiter
                for fut in self._requests.values():
                    fut.set_exception(e)
                return
            missing = keys - set(results)
            for k, fut in self._requests.items():
                if k in missing:
                    # "No data for dirs" (DirContentBatcher.java:148-151)
                    fut.set_exception(LookupError(f"no content loaded for {k!r}"))
                else:
                    fut.set_result(results[k])
        finally:
            self._owner._semaphore.release()


def load_dirs_content(spark, metrics_path: str, dirs: Set[str]) -> Dict[str, list]:
    """One batched children scan for many dirs — MetricSearch
    ``loadDirsContent``'s ``parent IN (...)`` query as a single Spark
    job over the metrics table (IN-list pushed to the parquet scan,
    read-time LWW status finalization).

    Returns ``{dir: [(name, status), ...]}`` sorted by name; dirs with
    no children map to [] (the loader must answer every requested key
    or the batcher reports the miss as an error).
    """
    from pyspark.sql import functions as F

    from graphouse_spark.operators.dedup import latest_status
    from graphouse_spark.sources.tables import read_metrics

    metrics = read_metrics(spark, metrics_path)
    rows = (
        latest_status(metrics.filter(F.col("parent").isin(list(dirs))))
        .select("parent", "name", "status")
        .collect()
    )
    out: Dict[str, list] = {d: [] for d in dirs}
    for r in rows:
        out[r["parent"]].append((r["name"], r["status"]))
    for d in out:
        out[d].sort()
    return out
