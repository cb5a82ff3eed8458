"""Per-request query log: the engine's ``system.query_log`` analog.

ClickHouse records every served query into ``system.query_log``; the
reference leans on that for diagnosing slow ``/metricData`` traffic
(its own counters — ``statistics.py`` here, Graphouse's
``StatisticsService`` — only aggregate). This module adds the
per-request records those counters average away: route, target,
duration, row count, outcome, ``reqKey`` (the reference threads the
same key through for request tracing — graphouse.py:78-88).

Deliberately driver-local: a bounded ring buffer, no Spark job per
record (a log that costs a cluster round-trip per request would
distort the very latencies it measures). ``frame()`` lifts the ring
into a DataFrame on demand so it joins/aggregates like any table;
long-term retention belongs to the caller (append ``frame()`` to
parquet on whatever cadence suits).
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

#: query_log schema (system.query_log's core columns, engine-adapted)
LOG_SCHEMA = ("event_time long, route string, detail string, "
              "req_key string, duration_ms double, rows long, status string")


class QueryLog:
    def __init__(self, capacity: int = 10000) -> None:
        self._ring: deque = deque(maxlen=capacity)
        self._lock = threading.Lock()

    def record(self, route: str, detail: str, event_time: int,
               duration_ms: float, rows: int, status: str,
               req_key: str | None = None) -> None:
        with self._lock:
            self._ring.append({
                "event_time": int(event_time),
                "route": route,
                "detail": detail,
                "req_key": req_key,
                "duration_ms": round(float(duration_ms), 3),
                "rows": int(rows),
                "status": status,
            })

    @contextmanager
    def track(self, route: str, detail: str, req_key: str | None = None):
        """Time a request; the yielded dict's ``rows`` is read back on
        exit. Exceptions still log (status = the error class name) and
        propagate — a failed query belongs in the log MORE than a
        served one."""
        t0 = time.perf_counter()
        started = int(time.time())
        out = {"rows": 0}
        try:
            yield out
        except Exception as e:
            self.record(route, detail, started,
                        (time.perf_counter() - t0) * 1000.0,
                        out.get("rows", 0), type(e).__name__, req_key)
            raise
        self.record(route, detail, started,
                    (time.perf_counter() - t0) * 1000.0,
                    out.get("rows", 0), "ok", req_key)

    def entries(self, limit: int | None = None) -> list[dict]:
        with self._lock:
            items = list(self._ring)
        return items[-limit:] if limit else items

    def entries_json(self, limit: int | None = None) -> str:
        return json.dumps(self.entries(limit))

    def frame(self, spark: SparkSession) -> DataFrame:
        """The ring as a DataFrame (system.query_log the queryable
        table). Empty ring still yields the full schema."""
        rows = [
            (e["event_time"], e["route"], e["detail"], e["req_key"],
             e["duration_ms"], e["rows"], e["status"])
            for e in self.entries()
        ]
        return spark.createDataFrame(rows, LOG_SCHEMA)
