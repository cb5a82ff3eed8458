"""Metric-name tree operators over the ``metrics`` DataFrame.

DataFrame-native equivalents of the reference's in-memory tree
(MetricTree.java) so search works at any tree size without a driver
index:

- ``resolved_tree``  — argMax finalization (S8/S10)
- ``visible_tree``   — visibility incl. ancestor BAN/HIDDEN pruning
  (X1's subtree cut): a node is searchable only if every ancestor dir
  is visible. One explode of the (<=20-deep) ancestor prefix list +
  an anti-join against invisible dirs — no recursion, no driver loop.
- ``glob_search``    — X1 as one ``rlike`` filter over full names.
- ``modify_status``  — X4: append new status rows; the lattice is
  enforced against the current resolved status.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphouse_spark.globs import glob_to_regex
from graphouse_spark.operators.dedup import latest_status
from graphouse_spark.status import VISIBLE_STATUSES

def ancestors_col(name: Column) -> Column:
    """Array of ancestor dir paths (with trailing dots) of a node name.

    ``a.b.c`` / ``a.b.c.`` -> [``a.``, ``a.b.``]; level-1 names -> [].
    """
    body = F.when(name.endswith("."), name.substr(F.lit(1), F.length(name) - 1)).otherwise(name)
    parts = F.split(body, "\\.")
    return F.when(F.size(parts) <= 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(parts) - 1),
            lambda i: F.concat(F.array_join(F.slice(parts, F.lit(1), i), "."), F.lit(".")),
        )
    )


def resolved_tree(metrics: DataFrame, include_auto_hidden: bool = True) -> DataFrame:
    """Latest row per name (S8); optionally drop AUTO_HIDDEN like tree loads."""
    resolved = latest_status(metrics)
    if not include_auto_hidden:
        resolved = resolved.filter(F.col("status") != "AUTO_HIDDEN")
    return resolved


def visible_condition(status: Column) -> Column:
    return status.isin(*VISIBLE_STATUSES)


def visible_tree(metrics: DataFrame) -> DataFrame:
    """Resolved nodes that are visible and have no invisible ancestor dir.

    The reference prunes invisible subtrees during recursion
    (MetricTree.java:220-224); declaratively that is: explode each
    node's ancestor-prefix array (depth <= 20 by validation) and
    anti-join against the set of invisible dirs.
    """
    resolved = resolved_tree(metrics)
    visible = resolved.filter(visible_condition(F.col("status")))
    invisible_dirs = resolved.filter(
        F.col("name").endswith(".") & ~visible_condition(F.col("status"))
    ).select(F.col("name").alias("_bad_dir"))

    with_anc = visible.select("name", F.explode_outer(ancestors_col(F.col("name"))).alias("_anc"))
    blocked = (
        with_anc.join(F.broadcast(invisible_dirs), with_anc["_anc"] == F.col("_bad_dir"), "inner")
        .select("name")
        .distinct()
    )
    return visible.join(blocked, "name", "left_anti")


def incremental_scan(metrics: DataFrame, updated_from, updated_to=None) -> DataFrame:
    """S9: tree refresh — latest status of names touched in a window.

    ``PREWHERE updated >= ? AND updated <= ?`` + argMax
    (MetricSearch.java:356-391). The updated-range filter is pushed to
    the scan; the reference's LIMIT/OFFSET pagination is unnecessary
    under Spark (the scan distributes).
    """
    cond = F.col("updated") >= updated_from
    if updated_to is not None:
        cond = cond & (F.col("updated") <= updated_to)
    return latest_status(metrics.filter(cond))


def glob_search(metrics: DataFrame, query: str, include_dirs: bool = True) -> DataFrame:
    """X1: glob search as one JVM-side regex filter over visible names.

    Returns names; directories keep their trailing dot. Invalid globs
    yield an empty result (MetricTree.java:101-103).
    """
    regex = glob_to_regex(query)
    tree = visible_tree(metrics)
    if regex is None:
        return tree.select("name").filter(F.lit(False))
    # a dir 'a.b.' matches the query 'a.b' — the reference matches
    # per-level names and emits dirs with their trailing dot
    body = F.when(
        F.col("name").endswith("."), F.col("name").substr(F.lit(1), F.length("name") - 1)
    ).otherwise(F.col("name"))
    matched = tree.filter(body.rlike(regex))
    if not include_dirs:
        matched = matched.filter(~F.col("name").endswith("."))
    return matched.select("name").orderBy("name")


def modify_status(metrics: DataFrame, name: str, new_status: str, now) -> DataFrame:
    """X4: rows to append for a status change, honoring the lattice.

    Returns a (possibly empty) DataFrame in METRICS_SCHEMA shape that
    the caller appends to the metrics table; read-time argMax then
    resolves the new state.
    """
    from graphouse_spark.status import MetricStatus, select_status

    current = resolved_tree(metrics).filter(F.col("name") == name).collect()
    if not current:
        return metrics.sparkSession.createDataFrame([], metrics.schema)
    row = current[0]
    resolved = select_status(MetricStatus(row["status"]), MetricStatus(new_status))
    if resolved.value == row["status"]:
        return metrics.sparkSession.createDataFrame([], metrics.schema)
    return metrics.sparkSession.createDataFrame(
        [(name, row["level"], row["parent"], resolved.value, now)], metrics.schema
    )
