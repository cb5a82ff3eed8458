"""Read-path step resolution and range snapping (driver-side arithmetic).

Parity: /root/reference/src/main/java/ru/yandex/market/graphouse/data/MetricDataQueryParams.java:24-42
Golden tests ported from MetricDataQueryParamsTest.java:34-50.

The step for a query is the coarsest retention step among the queried
metrics at the query's age; if that still yields more than
``max_points_per_metric`` buckets, the step is inflated by the ceil
ratio. Start/end are then snapped onto the step grid.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterable

from graphouse_spark.retention import MetricRetention


@dataclass(frozen=True)
class MetricDataQueryParams:
    start_time_seconds: int
    end_time_seconds: int
    step_seconds: int

    @classmethod
    def create(
        cls,
        retentions: Iterable[MetricRetention],
        start_time_seconds: int,
        end_time_seconds: int,
        max_points_per_metric: int = -1,
        now_seconds: int | None = None,
    ) -> "MetricDataQueryParams":
        now = int(time.time()) if now_seconds is None else now_seconds
        age_seconds = now - start_time_seconds
        steps = [r.step_size(age_seconds) for r in retentions]
        step = max(steps) if steps else 1

        time_seconds = end_time_seconds - start_time_seconds
        data_points = time_seconds // step
        if 0 < max_points_per_metric < data_points:
            ratio = -(-data_points // max_points_per_metric)  # ceil div
            step = step * ratio
            data_points = time_seconds // step
        start = start_time_seconds // step * step
        end = start + data_points * step
        return cls(start, end, step)

    @property
    def num_points(self) -> int:
        return (self.end_time_seconds - self.start_time_seconds) // self.step_seconds


#: graphite relative-time units, in seconds (graphite-web attTime.py
#: vocabulary: s/min/h/d/w/mon/y, with mon=30d and y=365d)
_TIME_UNITS = {
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
    "min": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
    "mon": 2592000, "month": 2592000, "months": 2592000,
    "y": 31536000, "year": 31536000, "years": 31536000,
}


def parse_render_time(spec: str, now_seconds: int) -> int:
    """graphite from/until time spec -> epoch seconds.

    Accepts absolute epoch integers, ``now``, and the relative form
    ``-<N><unit>`` (``-1h``, ``-30min``, ``-7d`` — graphite-web's
    attTime vocabulary with mon=30d, y=365d). Anything else raises
    ValueError (the HTTP layer maps that to 400).
    """
    import re as _re

    s = spec.strip().lower()
    if s == "now":
        return now_seconds
    if _re.fullmatch(r"-?\d+", s):
        return int(s)
    m = _re.fullmatch(r"-(\d+)([a-z]+)", s)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit in _TIME_UNITS:
            return now_seconds - n * _TIME_UNITS[unit]
    raise ValueError(f"bad time spec {spec!r}")
