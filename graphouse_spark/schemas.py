"""Declared schemas for the engine's two persistent tables.

Parity: reference DDL /root/reference/doc/install.md:155-184 (data,
metrics). Schemas are always declared, never inferred (SURVEY §1.3).

``data``    — time-series points, partitioned by ``date`` on disk and
              sorted within files by (metric, timestamp) so Parquet
              row-group min/max stats reproduce the ClickHouse
              ``ORDER BY (metric, timestamp)`` prune-and-seek effect.
``metrics`` — the metric-name tree. Append-only; the latest row per
              name wins at read time via ``max_by(status, updated)``
              (ReplacingMergeTree finalization is a *read-time*
              operator, MetricSearch.java:320-324).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: graphite.data (install.md:173-184)
DATA_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("value", DoubleType(), True),
        StructField("timestamp", LongType(), False),  # event epoch seconds (producer clock)
        StructField("date", DateType(), False),  # partition/prune column, UTC day of timestamp
        StructField("updated", LongType(), False),  # arrival epoch seconds (version for LWW)
    ]
)

#: graphite.metrics (install.md:158-170); Enum8 status -> string
METRICS_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),  # trailing '.' marks a directory
        StructField("level", IntegerType(), False),
        StructField("parent", StringType(), False),
        StructField("status", StringType(), False),
        StructField("updated", TimestampType(), False),
    ]
)

#: parsed graphite plaintext line (server/BaseMetricFactory.java:41-78)
LINE_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("timestamp", LongType(), True),
        StructField("updated", LongType(), True),
    ]
)


#: graphite_tagged analog (ENGINE EXTENSION): the persisted tag index.
#: One row per (metric, tag, value) seen on ingest, partitioned by the
#: day the series was last written — the same design carbon-clickhouse
#: uses for its graphite_tagged table ((Date, Tag1, Path) ordered by
#: tag then path), re-expressed as a date-partitioned parquet table
#: sorted by (tag, value, metric) so tag-equality browses prune to a
#: few row groups. The implicit ``name`` tag is materialized too.
TAGS_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),  # full canonical tagged name
        StructField("tag", StringType(), False),
        StructField("value", StringType(), False),
        StructField("date", DateType(), False),  # last-seen day (partition)
    ]
)


#: distinct-values SUB-INDEX beside the tag index: one row per
#: (tag, value) pair ever seen, with its last-seen day. Orders of
#: magnitude smaller than TAGS (no metric column — ``host`` with 10M
#: series still yields 10M rows here, but ``datacenter`` with 13
#: values yields 13), so a regex-only ``=~`` term compiles against the
#: distinct values first and rewrites itself into a sargable
#: value-IN-list on the main index instead of a per-metric map
#: compile over the whole namespace. Correctness contract: the
#: sub-index must be a SUPERSET of the main index's (tag, value)
#: pairs inside any lookback window (over-approximation only ever
#: costs a wasted candidate, never a lost series).
TAG_VALUES_SCHEMA = StructType(
    [
        StructField("tag", StringType(), False),
        StructField("value", StringType(), False),
        StructField("date", DateType(), False),  # last-seen day
    ]
)


#: distinct-METRIC (universe) sub-index beside the tag index: one row
#: per tagged metric per append batch (compacted to one per metric by
#: rewrites), with its last-seen day. Serves the all-negative
#: seriesByTag universe and the no-term browse WITHOUT scanning the
#: main index's name slice (2 sorted columns vs 4 interleaved with
#: every other tag's rows). Correctness contract is EXACTNESS, not
#: superset: an extra (deleted) metric would RESURRECT in all-negative
#: answers, a missing one would silently hide — so rewrites invalidate
#: this slice BEFORE the main swap and rebuild it after; readers treat
#: ABSENT as "fall back to the name-slice one-pass plan"
#: (correct, slower).
TAG_METRICS_SCHEMA = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("date", DateType(), False),  # last-seen day
    ]
)
