"""Auto-hide stale, sparse metrics (X5/A4).

Parity: AutoHideService.java:97-160 — a metric is auto-hidden when it
has fewer than ``max_values_count`` points AND its newest arrival is
older than ``retention_days``:

    SELECT metric, count() AS cnt, max(updated) AS ts FROM data
    GROUP BY metric HAVING cnt < ? AND ts < toUInt32(toDateTime(today() - ?))

The reference walks the tree in >=10k-name ranges because a full-table
GROUP BY is expensive for its row store; under Spark one distributed
aggregation over the whole table is the natural (and cheaper) plan, so
the range batching disappears (SURVEY §2.11 X5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_stale_metrics(data: DataFrame, max_values_count: int = 200,
                       retention_days: int = 7, now_seconds: int | None = None) -> DataFrame:
    """Metrics eligible for AUTO_HIDDEN: (metric, cnt, last_updated)."""
    if now_seconds is None:
        cutoff = F.unix_timestamp(F.date_sub(F.current_date(), retention_days))
    else:
        cutoff = F.lit(now_seconds - retention_days * 86400)
    return (
        data.groupBy("metric")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("updated").alias("last_updated"))
        .filter((F.col("cnt") < max_values_count) & (F.col("last_updated") < cutoff))
    )


def autohide_updates(data: DataFrame, metrics: DataFrame, max_values_count: int = 200,
                     retention_days: int = 7, now_seconds: int | None = None) -> DataFrame:
    """Rows to append to ``metrics``: stale names flipped to AUTO_HIDDEN.

    Only names whose current resolved status permits the transition
    (the lattice denies AUTO_HIDDEN over BAN/APPROVED/HIDDEN) are
    emitted — the same filtering the reference applies via
    MetricStatus.selectStatus on each hit.
    """
    from graphouse_spark.operators.dedup import latest_status
    from graphouse_spark.status import MetricStatus, RESTRICTED_EDGES

    stale = find_stale_metrics(data, max_values_count, retention_days, now_seconds)
    resolved = latest_status(metrics)
    # statuses whose edge to AUTO_HIDDEN is restricted
    blocked = [s.value for s, denied in RESTRICTED_EDGES.items() if MetricStatus.AUTO_HIDDEN in denied]
    now_ts = F.from_unixtime(F.lit(now_seconds)).cast("timestamp") if now_seconds else F.current_timestamp()
    return (
        resolved.join(stale.select(F.col("metric").alias("name")), "name", "left_semi")
        .filter(~F.col("status").isin(blocked) & (F.col("status") != "AUTO_HIDDEN"))
        .select("name", "level", "parent", F.lit("AUTO_HIDDEN").alias("status"), now_ts.alias("updated"))
    )
