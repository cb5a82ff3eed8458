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
