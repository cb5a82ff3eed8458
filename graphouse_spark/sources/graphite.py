"""Graphite plaintext protocol parsing (batch + streaming shared).

Parity: server/BaseMetricFactory.java:41-91 + MetricValidator — a line
is ``<name> <value> <timestamp>``; reject non-finite values, ts <= 0,
invalid names; float timestamps are rounded; ``updated`` is the server
arrival time. The optional host-redirect rewrite (S4) moves
``prefix.host.rest`` to ``prefix.<dir>.host.rest`` for hosts matching
a postfix.

Everything is Column expressions — one ``select`` over the raw lines,
fully codegen'd, identical for the streaming and batch paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphouse_spark.paths import MetricValidator


def parse_lines(lines: DataFrame, updated: Column | None = None,
                validator: MetricValidator | None = None,
                line_col: str = "value") -> DataFrame:
    """Raw line DataFrame -> validated (name, value, timestamp, updated).

    Invalid lines are dropped (the reference counts and skips them).
    """
    validator = validator or MetricValidator()
    if updated is None:
        updated = F.unix_timestamp(F.current_timestamp())
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    name = parts.getItem(0)
    # try_cast: malformed numbers become null (then filtered) instead of
    # throwing under ANSI mode
    value = parts.getItem(1).try_cast("double")
    # float timestamps are rounded to seconds (BaseMetricFactory.java:70-74)
    ts = F.round(parts.getItem(2).try_cast("double")).try_cast("long")
    parsed = lines.select(
        name.alias("name"),
        value.alias("value"),
        ts.alias("timestamp"),
        updated.cast("long").alias("updated"),
        F.size(parts).alias("_n"),
    )
    # Double.isFinite (BaseMetricFactory.java:66-69): Spark happily casts
    # 'Infinity'/'-Infinity' strings to doubles, so an explicit finite-range
    # check is needed; NaN fails the between too (SQL comparison -> null).
    finite = F.col("value").between(-1.7976931348623157e308, 1.7976931348623157e308)
    return parsed.filter(
        (F.col("_n") == 3)
        & F.col("value").isNotNull()
        & finite
        & F.col("timestamp").isNotNull()
        & (F.col("timestamp") > 0)
        & validator.valid_condition(F.col("name"))
    ).drop("_n")


def redirect_host_metrics(parsed: DataFrame, host_postfixes: dict[str, str]) -> DataFrame:
    """S4: ``prefix.host<postfix>.rest`` -> ``prefix.<dir>.host<postfix>.rest``.

    ``host_postfixes`` maps postfix -> directory name, e.g.
    ``{"_dc1_net": "hosts"}``.
    """
    name = F.col("name")
    for postfix, dir_name in host_postfixes.items():
        second = F.split(name, r"\.").getItem(1)
        # tagged names are exempt: ';k=v' suffixes would spoof the
        # postfix match via the tag VALUE and corrupt the series name
        needs = second.endswith(postfix) & ~name.contains(";")
        rewritten = F.concat(
            F.split(name, r"\.").getItem(0),
            F.lit("." + dir_name + "."),
            F.expr("substring(name, instr(name, '.') + 1)"),
        )
        name = F.when(needs, rewritten).otherwise(name)
    return parsed.withColumn("name", name)


def to_data_rows(parsed: DataFrame) -> DataFrame:
    """Parsed lines -> ``data`` table shape (adds the UTC date column)."""
    return parsed.select(
        F.col("name").alias("metric"),
        "value",
        "timestamp",
        F.to_date(F.from_unixtime("timestamp")).alias("date"),
        "updated",
    )


def metric_tree_rows(names: DataFrame, status: str = "SIMPLE", name_col: str = "name") -> DataFrame:
    """Expand metric names into tree rows incl. every ancestor dir.

    The reference writes the full ancestor chain for each new metric
    (UpdateMetricQueueService.java:44-54). One explode, no driver loop.
    """
    from graphouse_spark.operators.tree import ancestors_col
    from graphouse_spark.paths import level_col, parent_col

    name = F.col(name_col)
    chain = F.array_union(ancestors_col(name), F.array(name))
    exploded = names.select(F.explode(chain).alias("name")).distinct()
    return exploded.select(
        "name",
        level_col(F.col("name")).alias("level"),
        parent_col(F.col("name")).alias("parent"),
        F.lit(status).alias("status"),
        F.current_timestamp().alias("updated"),
    )
