"""Aggregate navigation: serve coarse-step queries from rollup tables.

The reference's GraphiteMergeTree keeps pre-aggregated data per
retention age and ClickHouse transparently reads whichever part matches
the queried range (`doc/install.md:181-184`; retention config
`graphouse-default.properties` -> graphite_rollup). This module is the
query-planner half of that contract for the Spark lake: given a set of
materialized rollup tables, answer a `/metricData`-style request from
the COARSEST table whose step divides the requested step — scanning
step/raw_step times fewer rows — and fall back to raw otherwise.

Exactness, not approximation: rollups store mergeable PARTIALS
(integer-cent sum + count), never finished averages, so re-bucketing a
rollup is the same associative integer arithmetic as aggregating raw
points — bit-identical results from any eligible table
(avg-of-avg is NOT avg; sum-of-sums is). This is the same partials
discipline as `streaming/windowed.start_continuous_aggregate` and the
HLL sketch table: every stored aggregate must merge losslessly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class AggTable:
    """A materialized partial-sum rollup: (metric, ts, sum_cents, cnt)
    with ts aligned to ``step`` buckets. ``step`` of the raw table is
    its native point spacing (or 1 when irregular)."""

    df: DataFrame
    step: int


def build_partial_rollup(points: DataFrame, step: int,
                         metric_col: str = "metric", ts_col: str = "timestamp",
                         value_col: str = "value") -> DataFrame:
    """Materialize a rollup at ``step``: integer-cent sum + count per
    (metric, bucket). One shuffle with full map-side partial agg."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        points.groupBy(
            metric_col, (F.col(ts_col) - F.col(ts_col) % step).alias("ts")
        )
        .agg(F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("cnt"))
    )


def raw_as_partials(points: DataFrame, native_step: int = 1,
                    metric_col: str = "metric", ts_col: str = "timestamp",
                    value_col: str = "value") -> AggTable:
    """Wrap the raw points table in the partials schema (cnt=1 rows) so
    the navigator treats raw as just the finest rollup."""
    df = points.select(
        F.col(metric_col).alias("metric"),
        F.col(ts_col).alias("ts"),
        F.round(F.col(value_col) * 100).cast("long").alias("sum_cents"),
        F.lit(1).cast("long").alias("cnt"),
    )
    return AggTable(df, native_step)


def choose_table(tables: list[AggTable], query_step: int) -> AggTable:
    """The coarsest table whose buckets nest inside the query buckets.

    A table is eligible iff ``query_step % table.step == 0`` — then
    every stored bucket falls entirely inside one query bucket and the
    partials merge exactly. Coarser = fewer rows scanned, so pick max.
    """
    eligible = [t for t in tables if query_step % t.step == 0]
    if not eligible:
        raise ValueError(
            f"no table's step divides query step {query_step}; "
            f"have {[t.step for t in tables]}"
        )
    return max(eligible, key=lambda t: t.step)


def serve(tables: list[AggTable], start: int, end: int, query_step: int,
          function: str = "avg") -> DataFrame:
    """Answer (metric, ts, value) at ``query_step`` over [start, end)
    from the best eligible table. ``function``: avg | sum | count.

    The time filter lands on the rollup's own ts column, so partition
    pruning / zonemap skipping applies to the rollup exactly as it
    would to raw.
    """
    t = choose_table(tables, query_step)
    bucket = (F.col("ts") - F.col("ts") % query_step).alias("ts")
    merged = (
        t.df.filter((F.col("ts") >= start) & (F.col("ts") < end))
        .groupBy("metric", bucket)
        .agg(F.sum("sum_cents").alias("s"), F.sum("cnt").alias("c"))
    )
    if function == "avg":
        value = F.round(F.col("s") / (F.col("c") * 100.0), 6)
    elif function == "sum":
        value = F.round(F.col("s") / 100.0, 6)
    elif function == "count":
        value = F.col("c").cast("double")
    else:
        raise ValueError(f"unsupported navigation function: {function}")
    return merged.select("metric", "ts", value.alias("value"))
