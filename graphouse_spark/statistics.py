"""Self-monitoring: the engine feeds its own counters back as metrics.

Parity: statistics/StatisticsCounter.java:90-145, AccumulatedMetric,
InstantMetric — named counters accumulate between flushes; a flush
emits ``<prefix>.<name> <value> <ts>`` lines with ts rounded DOWN to
the flush period and resets accumulators; instant gauges are sampled
at flush time. The emitted lines re-enter the normal ingest path, so
the engine monitors itself with itself (the reference pushes into its
own MetricCacher the same way).

In streaming jobs, hook :class:`IngestStatsListener` onto the session
to count rows per micro-batch automatically.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from typing import Callable


class StatisticsService:
    def __init__(self, prefix: str = "five_sec.graphouse.statistics",
                 flush_period_seconds: int = 5) -> None:
        self.prefix = prefix
        self.period = flush_period_seconds
        self._counters: dict[str, float] = defaultdict(float)
        self._gauges: dict[str, Callable[[], float]] = {}
        self._lock = threading.Lock()

    def accumulate(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def register_gauge(self, name: str, supplier: Callable[[], float]) -> None:
        self._gauges[name] = supplier

    def flush(self, now_seconds: int | None = None) -> list[str]:
        """Graphite lines for the period; counters reset (StatisticsCounter.java:131-145)."""
        now = int(time.time()) if now_seconds is None else now_seconds
        ts = now // self.period * self.period  # rounded down to the flush period
        lines: list[str] = []
        with self._lock:
            snapshot = dict(self._counters)
            self._counters.clear()
        for name, value in sorted(snapshot.items()):
            lines.append(f"{self.prefix}.{name} {value} {ts}")
        for name, supplier in sorted(self._gauges.items()):
            lines.append(f"{self.prefix}.{name} {supplier()} {ts}")
        return lines


class IngestStatsListener:
    """StreamingQueryListener adapter counting processed rows per batch.

    Registered via ``spark.streams.addListener`` — the Spark-native
    replacement for the reference's hand-rolled counters on the TCP
    reader threads.
    """

    def __init__(self, stats: StatisticsService):
        self.stats = stats

    def make(self, spark):
        from pyspark.sql.streaming import StreamingQueryListener

        stats = self.stats

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                stats.accumulate("metric_cacher.received", event.progress.numInputRows)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        listener = _L()
        spark.streams.addListener(listener)
        return listener
