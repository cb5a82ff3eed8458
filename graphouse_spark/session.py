"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship as cluster defaults (AQE on, shuffle partitions
sized to cores, Arrow for the pandas paths, UTC everywhere — the
reference's date column derivation is timezone-dependent, we pin UTC
and document the delta; see SURVEY §7 risk register / C11).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "graphouse-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # driver test data carries TIMESTAMP(NANOS) which Spark has no type
        # for; read as long (nanos since epoch) and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def cluster_conf(executor_cores: int = 4, executors: int = 1000,
                 target_partition_mb: int = 128) -> dict[str, str]:
    """The conf this engine would ship to a real 100 TB cluster.

    Not used by the local factory (local[N] ignores most of it) —
    documented as code so the scale posture is explicit and testable:

    - shuffle partitions ~2x total cores: keeps every core busy through
      stragglers while AQE coalesces the small ones post-shuffle;
    - 128 MiB scan splits: matches parquet row-group sizing from
      sources/tables.py, so one task ~ one row group;
    - AQE owns runtime re-planning (skew splits, join demotion);
    - 64 MiB broadcast threshold: nation/region/supplier-sized dims
      broadcast, fact-fact joins shuffle;
    - shuffle + spill compression on: at 100 TB the network is the
      bottleneck, not CPU.
    """
    total_cores = executor_cores * executors
    return {
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.sql.parquet.filterPushdown": "true",
    }
