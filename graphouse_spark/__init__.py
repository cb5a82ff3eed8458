"""graphouse_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the capabilities of ClickHouse/graphouse
(a Graphite-to-ClickHouse gateway) on top of Apache Spark:

- storage: Parquet tables ``data`` / ``metrics`` (partitioned by date,
  sorted by (metric, timestamp)) replace GraphiteMergeTree /
  ReplacingMergeTree,
- query: DataFrame pipelines (last-writer-wins dedup -> time-bucket
  aggregation -> gap-filled series) replace generated ClickHouse SQL,
- ingest: Structured Streaming over the Graphite plaintext protocol
  replaces the TCP server + micro-batcher,
- plus large-scale pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) beyond the reference surface.

Everything is expressed Spark-first: declarative DataFrame plans that
Catalyst can push down, prune, and broadcast — never a translation of
the reference's Java/ClickHouse execution strategy.
"""

__version__ = "0.1.0"

from graphouse_spark.status import MetricStatus, select_status
from graphouse_spark.paths import (
    MetricValidator,
    get_last_level_name,
    get_level,
    get_parent_name,
    is_dir,
    split_to_levels,
)
from graphouse_spark.globs import (
    contains_expressions,
    glob_to_regex,
    level_glob_to_regex,
)
from graphouse_spark.retention import (
    CombinedRetentionProvider,
    DefaultRetentionProvider,
    MetricRetention,
    MetricRetentionConfig,
)
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.sources.tables import epoch_seconds, register_corpus
from graphouse_spark.tree_index import MetricTree

__all__ = [
    "MetricTree",
    "MetricStatus",
    "select_status",
    "MetricValidator",
    "is_dir",
    "split_to_levels",
    "get_last_level_name",
    "get_parent_name",
    "get_level",
    "contains_expressions",
    "glob_to_regex",
    "level_glob_to_regex",
    "MetricRetention",
    "MetricRetentionConfig",
    "CombinedRetentionProvider",
    "DefaultRetentionProvider",
    "MetricDataQueryParams",
    "epoch_seconds",
    "register_corpus",
]
