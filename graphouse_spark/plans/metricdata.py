"""The /metricData read path — the engine's flagship query plan.

Parity: MetricDataService.java:45-98 + MetricDataRowCallbackHandler
golden JSON. Pipeline (SURVEY §3.1):

    glob expansion (tree)            -> metric name list
    group metrics by retention func  -> one pipeline per function
    per group:
      F1 IN-list ∧ F2 ts-range ∧ F3 date partition prune
      A1 LWW dedup (max_by(value, updated) per metric, timestamp)
      A2 bucket agg  (<func> per metric, floor(ts/step)*step)
      W3 grid left-join gap fill
    unionByName across groups -> JSON {metric: {start, end, step, points}}

Scale notes:
- the metric IN-list filter is pushed to the Parquet scan (names are
  literal strings), so with the (metric, timestamp)-sorted layout the
  scan touches only matching row groups;
- the redundant ``date`` predicate (F3) is derived from the ts range
  exactly like the reference adds it for ClickHouse partition pruning
  (MetricDataService.java:75) — here it prunes parquet partitions;
- dedup+bucket are two chained aggregations on the same key prefix —
  Catalyst plans partial/final pairs, AQE coalesces the output;
- when the IN-list is huge, pass a DataFrame of names instead and the
  filter becomes a broadcast semi-join (J2).
"""

from __future__ import annotations

import json
import math
from collections import defaultdict
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.operators.bucket import bucket_aggregate
from graphouse_spark.operators.dedup import dedup_points
from graphouse_spark.operators.gapfill import gap_filled_series
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import CombinedRetentionProvider, DefaultRetentionProvider


def filter_points(data: DataFrame, metric_names: "Iterable[str] | DataFrame",
                  start: int, end: int) -> DataFrame:
    """F1 ∧ F2 ∧ F3: names, half-open ts range, redundant date prune."""
    cond = (
        (F.col("timestamp") >= start)
        & (F.col("timestamp") < end)
        & (F.col("date") >= F.to_date(F.from_unixtime(F.lit(start))))
        & (F.col("date") <= F.to_date(F.from_unixtime(F.lit(end))))
    )
    filtered = data.filter(cond)
    if isinstance(metric_names, DataFrame):
        names = metric_names.select(F.col(metric_names.columns[0]).alias("metric"))
        return filtered.join(F.broadcast(names), "metric", "left_semi")
    return filtered.filter(F.col("metric").isin(list(metric_names)))


def metric_series(spark: SparkSession, data: DataFrame, metric_names: list[str],
                  start: int, end: int, step: int, function: str = "avg") -> DataFrame:
    """One retention-function group: filter -> dedup -> bucket -> gap fill."""
    filtered = filter_points(data, metric_names, start, end)
    deduped = dedup_points(filtered)
    bucketed = bucket_aggregate(deduped, step, function)
    return gap_filled_series(spark, bucketed, metric_names, start, end, step)


def render_series(rows, params: MetricDataQueryParams, metric_names: list[str]) -> dict:
    """Serialize bucketed (metric, ts, value) rows to the JSON contract.

    Parity with MetricDataRowCallbackHandler.java:37-105: every
    requested metric gets a full [start, end) series on the step grid;
    missing buckets and non-finite values are null; metrics with zero
    rows still emit an all-null series.
    """
    result: dict[str, dict] = {}
    for name in metric_names:
        result[name] = {
            "start": params.start_time_seconds,
            "end": params.end_time_seconds,
            "step": params.step_seconds,
            "points": [None] * params.num_points,
        }
    for row in rows:
        series = result.get(row["metric"])
        if series is None:
            continue
        offset = row["ts"] - params.start_time_seconds
        idx = offset // params.step_seconds
        if offset < 0 or idx >= params.num_points:
            continue
        v = row["value"]
        # Double.isFinite check in MetricDataRowCallbackHandler: NaN and
        # +/-Infinity both serialize as null (bare Infinity is not JSON).
        series["points"][idx] = None if v is None or not math.isfinite(v) else v
    return result


class MetricDataService:
    """Multi-metric read: per-function grouping + params + JSON contract."""

    def __init__(self, provider: CombinedRetentionProvider | None = None,
                 max_points_per_metric: int = -1,
                 data_path: str | None = None,
                 index_path: str | None = None) -> None:
        self.provider = provider or DefaultRetentionProvider()
        self.max_points_per_metric = max_points_per_metric
        # zonemap wiring (install.md:181-184 analog): when both paths
        # are configured and the index exists, get_data swaps the full
        # table scan for an index-pruned file list (sources/skipping.py)
        self.data_path = data_path
        self.index_path = index_path

    def query_params(self, metric_names: list[str], start: int, end: int,
                     now_seconds: int | None = None) -> MetricDataQueryParams:
        retentions = [self.provider.get_retention(m) for m in metric_names]
        return MetricDataQueryParams.create(
            retentions, start, end, self.max_points_per_metric, now_seconds
        )

    def get_data(self, spark: SparkSession, data: DataFrame, metric_names: list[str],
                 start: int, end: int, now_seconds: int | None = None,
                 params: MetricDataQueryParams | None = None) -> dict:
        """Gap-filled series dict, matching the reference JSON contract.

        ``{name: {"start": s, "end": e, "step": st, "points": [v|None, ...]}}``
        (MetricDataRowCallbackHandler.java:96-105; consumed by
        graphouse.py:119-131). Metrics with no rows still emit full
        null series; an empty metric list -> {}.
        """
        if not metric_names:
            return {}
        # per-function grouping (MetricDataService.java:45-52); params are
        # derived PER GROUP from that group's retentions only
        # (MetricDataService.java:55-58), so a mixed-retention request
        # renders each group at its own step, not the global max.
        groups: dict[str, list[str]] = defaultdict(list)
        for name in metric_names:
            groups[self.provider.get_retention(name).function].append(name)
        plan: list[tuple[str, list[str], MetricDataQueryParams]] = []
        for fn, names in groups.items():
            gparams = params if params is not None else self.query_params(
                names, start, end, now_seconds
            )
            plan.append((fn, names, gparams))
        # zonemap prune (sources/skipping.py): swap the full-table scan
        # for the index-surviving file list, using the WIDEST aligned
        # range across groups so every group's predicate is a subset of
        # what the pruned frame may contain. Falls back transparently
        # (returns None) when no index is configured/built.
        pruned = self._pruned_source(
            spark, metric_names,
            min(p.start_time_seconds for _, _, p in plan),
            max(p.end_time_seconds for _, _, p in plan),
        )
        if pruned is not None:
            data = pruned
        result: dict[str, dict] = {}
        for fn, names, gparams in plan:
            frame = metric_series(
                spark, data, names, gparams.start_time_seconds,
                gparams.end_time_seconds, gparams.step_seconds, fn,
            )
            result.update(render_series(frame.collect(), gparams, names))
        return result

    def _pruned_source(self, spark: SparkSession, metric_names: list[str],
                       start: int, end: int) -> DataFrame | None:
        """Index-pruned scan, or None when the zonemap can't be used."""
        if not self.data_path or not self.index_path:
            return None
        from graphouse_spark.sources.skipping import read_pruned_data

        return read_pruned_data(
            spark, self.data_path, self.index_path, metric_names, start, end
        )

    def get_data_json(self, *args, **kwargs) -> str:
        return json.dumps(self.get_data(*args, **kwargs))

    def base_series(self, spark: SparkSession, data: DataFrame,
                    metric_names: list[str], start: int, end: int,
                    now_seconds: int | None = None) -> DataFrame:
        """Gap-filled canonical (metric, ts, value) frame — the base a
        render-function tree evaluates over (/render serving path).

        Same per-retention-function grouping and zonemap pruning as
        :meth:`get_data`, but the groups UNION into one frame instead
        of serializing: graphite datapoints carry their own timestamps,
        so mixed per-group steps coexist in a single result.
        """
        if not metric_names:
            return spark.createDataFrame([], "metric string, ts long, value double")
        groups: dict[str, list[str]] = defaultdict(list)
        for name in metric_names:
            groups[self.provider.get_retention(name).function].append(name)
        plan = [
            (fn, names, self.query_params(names, start, end, now_seconds))
            for fn, names in groups.items()
        ]
        pruned = self._pruned_source(
            spark, metric_names,
            min(p.start_time_seconds for _, _, p in plan),
            max(p.end_time_seconds for _, _, p in plan),
        )
        if pruned is not None:
            data = pruned
        frames = [
            metric_series(spark, data, names, p.start_time_seconds,
                          p.end_time_seconds, p.step_seconds, fn)
            for fn, names, p in plan
        ]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
