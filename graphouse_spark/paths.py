"""Dotted metric-path utilities and name validation.

Semantics parity with the reference implementation:
- path arithmetic: /root/reference/src/main/java/ru/yandex/market/graphouse/MetricUtil.java:16-42
- validation: /root/reference/src/main/java/ru/yandex/market/graphouse/MetricValidator.java:29-62
- defaults: /root/reference/src/main/resources/graphouse-default.properties:123-128

A metric path is a dotted string like ``five_min.srv1.cpu.load``.
A **trailing dot marks a directory** (``five_min.srv1.``).

Pure-Python versions are used driver-side (tree index, validation of
API arguments); Column-expression versions (suffix ``_col``) are used
inside DataFrame plans so the work stays JVM-side at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

LEVEL_SPLITTER = "."

#: default validation knobs (graphouse-default.properties:123-128)
DEFAULT_METRIC_REGEXP = r"[-_0-9a-zA-Z\.]*$"
DEFAULT_MIN_LENGTH = 5
DEFAULT_MAX_LENGTH = 500
DEFAULT_MIN_DOTS = 2  # property is named min-levels but is compared to the dot count
DEFAULT_MAX_DOTS = 20


def is_dir(metric: str) -> bool:
    """True iff the path names a directory (trailing dot)."""
    return metric.endswith(LEVEL_SPLITTER)


def split_to_levels(metric: str) -> list[str]:
    """Split a path on dots (a dir's empty last component is dropped)."""
    return [p for p in metric.split(LEVEL_SPLITTER) if p != ""] if is_dir(metric) else metric.split(LEVEL_SPLITTER)


def get_last_level_name(metric: str) -> str:
    """Last path component; for dirs, the component before the trailing dot."""
    if is_dir(metric):
        body = metric[:-1]
    else:
        body = metric
    idx = body.rfind(LEVEL_SPLITTER)
    return body[idx + 1 :]


def get_parent_name(metric: str) -> str:
    """Parent directory path including its trailing dot ('' at the root)."""
    end = len(metric) - 2 if is_dir(metric) else len(metric) - 1
    idx = metric.rfind(LEVEL_SPLITTER, 0, end + 1)
    return metric[: idx + 1]


def get_level(metric: str) -> int:
    """Depth: dot count for dirs, dot count + 1 for plain metrics."""
    dots = metric.count(LEVEL_SPLITTER)
    return dots if is_dir(metric) else dots + 1


class MetricValidator:
    """Accept/reject metric names on ingest.

    Rules (MetricValidator.java:29-62): bounded length, bounded level
    count, no leading dot, no empty levels (double dots), charset
    regexp. Directory names skip the min-length and min-dots checks
    but are only allowed when ``allow_dirs``.
    """

    def __init__(
        self,
        metric_regexp: str = DEFAULT_METRIC_REGEXP,
        min_length: int = DEFAULT_MIN_LENGTH,
        max_length: int = DEFAULT_MAX_LENGTH,
        min_dots: int = DEFAULT_MIN_DOTS,
        max_dots: int = DEFAULT_MAX_DOTS,
    ) -> None:
        self.min_length = min_length
        self.max_length = max_length
        self.min_dots = min_dots
        self.max_dots = max_dots
        self.pattern = re.compile(metric_regexp)

    def validate(self, name: str, allow_dirs: bool = False) -> bool:
        if not name:
            return False
        dir_ = is_dir(name)
        if (not dir_ and len(name) < self.min_length) or len(name) > self.max_length:
            return False
        if name[0] == LEVEL_SPLITTER:
            return False
        if not allow_dirs and dir_:
            return False
        if ".." in name:
            return False
        # the reference counts the trailing dir dot toward the max (MetricValidator.java:49-58)
        dot_count = name.count(LEVEL_SPLITTER)
        if (not dir_ and dot_count < self.min_dots) or dot_count > self.max_dots:
            return False
        return self.pattern.fullmatch(name) is not None

    def valid_condition(self, name: Column, allow_dirs: bool = False) -> Column:
        """The same predicate as a Catalyst Column expression.

        Used on the ingest path so validation runs JVM-side inside
        whole-stage codegen over arbitrarily large batches (no Python
        UDF).
        """
        dir_ = name.endswith(LEVEL_SPLITTER)
        n = F.length(name)
        dot_count = n - F.length(F.replace(name, F.lit("."), F.lit("")))
        cond = (
            name.isNotNull()
            & (n > 0)
            & (n <= self.max_length)
            & (dir_ | (n >= self.min_length))
            & ~name.startswith(".")
            & ~name.contains("..")
            & (dir_ | (dot_count >= self.min_dots))
            & (dot_count <= self.max_dots)
            & name.rlike("^" + self.pattern.pattern)
        )
        if not allow_dirs:
            cond = cond & ~dir_
        return cond


def parent_col(name: Column) -> Column:
    """Column expression for :func:`get_parent_name`.

    ``a.b.c`` -> ``a.b.`` ; ``a.b.c.`` -> ``a.b.`` ; ``a`` -> ``''``.
    """
    body = F.when(
        name.endswith(LEVEL_SPLITTER), name.substr(F.lit(1), F.length(name) - 1)
    ).otherwise(name)
    rev_idx = F.instr(F.reverse(body), LEVEL_SPLITTER)  # last-dot position from the end
    return F.when(rev_idx == 0, F.lit("")).otherwise(
        body.substr(F.lit(1), F.length(body) - rev_idx + 1)
    )


def level_col(name: Column) -> Column:
    """Column expression for :func:`get_level`."""
    dots = F.length(name) - F.length(F.replace(name, F.lit("."), F.lit("")))
    return F.when(name.endswith(LEVEL_SPLITTER), dots).otherwise(dots + 1).cast("int")
