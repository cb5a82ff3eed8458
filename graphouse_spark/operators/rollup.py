"""Rollup compaction — the GraphiteMergeTree replacement (A7, SURVEY §7 step 6).

ClickHouse's GraphiteMergeTree collapses points older than each
retention tier's ``age`` into ``precision``-sized buckets with the
pattern's aggregation function, during background merges. Spark has no
storage-engine hook, so rollup is an explicit, idempotent batch job:

  for each date partition older than the finest tier:
    resolve (function, precision) per metric at age = now - ts
    LWW-dedup (A1)  ->  bucket to the tier precision with the
    pattern function  ->  overwrite the partition

Invariant (same as the reference): query results are unchanged by
compaction, because the read path applies the same dedup + bucket
aggregation regardless (MetricDataService.java:71-82 runs on both raw
and rolled-up rows).

Scale notes:
- partition-overwrite (dynamic mode) rewrites only aged partitions;
- retention resolution is a regex-rule lookup per *metric name*, not
  per row: we resolve distinct names (small) and broadcast-join the
  (metric -> function, precision) map back onto the points;
- the bucket agg itself is the single-pass multi-function variant —
  one shuffle for all patterns.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.operators.bucket import bucket_aggregate_multi
from graphouse_spark.operators.dedup import dedup_points
from graphouse_spark.retention import CombinedRetentionProvider


def resolve_retention_names(spark: SparkSession, names: list,
                            provider: CombinedRetentionProvider) -> DataFrame:
    """(metric, function, ranges: array<struct<age,step>>) per name.

    Rule regexes run driver-side over distinct NAMES only — the same
    set the reference keeps in its in-memory tree (J3), bounded by
    metric cardinality, never by names x days. The age -> precision
    lookup moves to executors (see rollup_partition), so adding a year
    of history costs nothing driver-side. If the name set ever outgrows
    the driver, the first-match itself can move to a crossJoin+rlike+
    min_by(priority) plan; the rule list is tiny either way.
    """
    rows = []
    for name in names:
        r = provider.get_retention(name)
        rows.append((name, r.function, [(int(a), int(p)) for a, p in r.ranges]))
    return spark.createDataFrame(
        rows, "metric string, function string, ranges array<struct<age:int,step:int>>"
    )


def rollup_partition(spark: SparkSession, points: DataFrame,
                     provider: CombinedRetentionProvider,
                     now_seconds: int) -> DataFrame:
    """Compact a slice of the data table per retention rules.

    Returns the replacement rows (same schema). Points whose tier
    precision is 1 pass through dedup only.

    The age of a day is measured at its end (23:59:59), so a whole
    partition gets one precision — matching GraphiteMergeTree, whose
    rollup params come from the merge window, not per row. The
    age -> step lookup runs executor-side against the broadcast ranges
    array: ranges are sorted ascending by age threshold, so the match
    is the LAST element with age <= day age (bisect_right - 1, as
    MetricRetention.step_size does in Python).
    """
    names = [r["metric"] for r in points.select("metric").distinct().collect()]
    if not names:
        return points
    ret_map = resolve_retention_names(spark, names, provider)

    deduped = dedup_points(points).withColumn(
        "date", F.to_date(F.from_unixtime("timestamp"))
    )  # (metric, timestamp, value, updated, date)
    day_end = F.unix_timestamp(F.date_add(F.col("date"), 1).cast("timestamp")) - 1
    age = F.greatest(F.lit(int(now_seconds)) - day_end, F.lit(0).cast("long"))
    precision = F.element_at(F.filter("ranges", lambda r: r["age"] <= age), -1)["step"]
    tagged = (
        deduped.join(F.broadcast(ret_map), "metric")
        .withColumn("precision", precision)
        .drop("ranges")
    )
    rolled = (
        tagged.groupBy(
            "metric",
            "function",
            (F.col("timestamp") - F.col("timestamp") % F.col("precision")).alias("ts"),
        )
        .agg(
            F.avg("value").alias("_avg"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
            F.sum("value").alias("_sum"),
            F.min_by("value", "timestamp").alias("_any"),
            F.max_by("value", "timestamp").alias("_last"),
            F.max("updated").alias("updated"),
        )
    )
    value = (
        F.when(F.col("function") == "avg", F.col("_avg"))
        .when(F.col("function") == "min", F.col("_min"))
        .when(F.col("function") == "max", F.col("_max"))
        .when(F.col("function") == "sum", F.col("_sum"))
        .when(F.col("function") == "any", F.col("_any"))
        .otherwise(F.col("_last"))
    )
    return rolled.select(
        "metric",
        value.alias("value"),
        F.col("ts").alias("timestamp"),
        F.to_date(F.from_unixtime("ts")).alias("date"),
        "updated",
    )


def compact_data_table(spark: SparkSession, data_path: str,
                       provider: CombinedRetentionProvider,
                       now_seconds: int | None = None,
                       min_age_seconds: int = 7 * 86400) -> list[str]:
    """Roll up every date partition older than ``min_age_seconds``.

    Idempotent: re-running maps already-rolled points onto the same
    buckets. Returns the list of rewritten partition dates.

    The rewrite goes through a sibling temp path, then swaps partition
    directories — Spark cannot overwrite a path it is reading, and a
    crash mid-swap loses at most one partition's compaction (the raw
    data is re-derivable; on a real deployment this job would target a
    table format with atomic replace, e.g. ``replaceWhere``).
    """
    import shutil
    from pathlib import Path

    from graphouse_spark.sources.tables import read_data

    now = now_seconds if now_seconds is not None else int(dt.datetime.now(dt.timezone.utc).timestamp())
    cutoff = dt.datetime.fromtimestamp(now - min_age_seconds, dt.timezone.utc).date()
    data = read_data(spark, data_path)
    dates = sorted(r["date"] for r in data.select("date").distinct().collect() if r["date"] < cutoff)
    if not dates:
        return []

    tmp_path = data_path.rstrip("/") + "_rollup_tmp"
    aged = data.filter(F.col("date").isin([str(d) for d in dates]))
    rolled = rollup_partition(spark, aged, provider, now)
    (
        rolled.repartition("metric")
        .sortWithinPartitions("date", "metric", "timestamp")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(tmp_path)
    )
    rewritten = []
    for d in dates:
        src = Path(tmp_path) / f"date={d}"
        dst = Path(data_path) / f"date={d}"
        if src.exists():
            shutil.rmtree(dst, ignore_errors=True)
            shutil.move(str(src), str(dst))
            rewritten.append(str(d))
    shutil.rmtree(tmp_path, ignore_errors=True)
    return rewritten
