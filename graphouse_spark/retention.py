"""Retention / rollup rule model.

Parity targets:
- step lookup: /root/reference/src/main/java/ru/yandex/market/graphouse/retention/MetricRetention.java:41-47
- range building: MetricRetention.java:84-121 (builder fills
  half-open ranges between sorted ages; last age extends to +inf)
- rule resolution incl. RETENTION/AGGREGATION combination:
  CombinedRetentionProvider.java:21-95
- default rule table: DefaultRetentionProvider.java:29-118
- rollup XML shape: /root/reference/doc/install.md:12-152

A retention is (aggregation function name, ordered breakpoints
age->precision). A rule config is (regexp, is_default, retention) and
is typed RETENTION (no function), AGGREGATION (no ranges) or ALL.
Resolution walks the priority-ordered rule list; the first RETENTION
match and first AGGREGATION match combine; an ALL match wins outright;
the default rule closes the search (MetricRetentionConfig.java:42-58).
"""

from __future__ import annotations

import bisect
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

DAY = 86_400
MONTH = 30 * DAY
YEAR = 12 * MONTH


class MetricRetention:
    """Aggregation function + age->precision(step) breakpoints."""

    def __init__(self, function: str, retentions: dict[int, int] | None = None) -> None:
        self.function = function
        # builder semantics: addRetention(0, 0) wipes the map -> AGGREGATION-only rule
        if retentions and any(a == 0 and p == 0 for a, p in retentions.items()):
            retentions = None
        items = sorted((retentions or {}).items())
        self._ages = [a for a, _ in items]
        self._precisions = [p for _, p in items]

    @property
    def is_empty(self) -> bool:
        return not self._ages

    @property
    def ranges(self) -> list[tuple[int, int]]:
        return list(zip(self._ages, self._precisions))

    def step_size(self, age_seconds: int) -> int:
        """Precision of the range containing max(age, 0)."""
        age = max(age_seconds, 0)
        idx = bisect.bisect_right(self._ages, age) - 1
        if idx < 0 or not self._ages:
            raise ValueError(f"no retention step for age {age_seconds}: {self.ranges}")
        return self._precisions[idx]

    def with_ranges_of(self, other: "MetricRetention") -> "MetricRetention":
        """New retention: this function, the other's ranges (rule combination)."""
        combined = MetricRetention(self.function)
        combined._ages = list(other._ages)
        combined._precisions = list(other._precisions)
        return combined

    def __repr__(self) -> str:  # pragma: no cover
        return f"MetricRetention(function={self.function!r}, ranges={self.ranges})"


RULE_RETENTION = "RETENTION"
RULE_AGGREGATION = "AGGREGATION"
RULE_ALL = "ALL"


@dataclass
class MetricRetentionConfig:
    regexp: str
    is_default: bool
    retention: MetricRetention
    _compiled: "re.Pattern[str]" = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self._compiled = re.compile(self.regexp)

    @property
    def rule_type(self) -> str:
        if not self.retention.function:
            return RULE_RETENTION
        if self.retention.is_empty:
            return RULE_AGGREGATION
        return RULE_ALL

    def matches(self, name: str) -> bool:
        # Java Pattern.matches() == full anchoring (re.fullmatch)
        return True if self.is_default else self._compiled.fullmatch(name) is not None


class CombinedRetentionProvider:
    """First-match resolution with RETENTION+AGGREGATION combination."""

    def __init__(self, configs: list[MetricRetentionConfig]) -> None:
        self.configs = configs
        self._cache: dict[str, MetricRetention] = {}

    def get_retention(self, metric: str) -> MetricRetention:
        cached = self._cache.get(metric)
        if cached is not None:
            return cached
        result = self._resolve(metric)
        self._cache[metric] = result
        return result

    def _resolve(self, metric: str) -> MetricRetention:
        first_match: MetricRetentionConfig | None = None
        for cfg in self.configs:
            if cfg.is_default:
                if first_match is None:
                    if cfg.rule_type == RULE_ALL:
                        return cfg.retention
                    break
                if first_match.rule_type != cfg.rule_type:
                    if first_match.rule_type == RULE_RETENTION:
                        return self._combine(first_match, cfg)
                    if first_match.rule_type == RULE_AGGREGATION:
                        return self._combine(cfg, first_match)
                break
            if cfg.matches(metric):
                if cfg.rule_type == RULE_ALL:
                    return cfg.retention
                if first_match is None:
                    first_match = cfg
                    continue
                if first_match.rule_type == RULE_AGGREGATION and cfg.rule_type == RULE_RETENTION:
                    return self._combine(cfg, first_match)
                if first_match.rule_type == RULE_RETENTION and cfg.rule_type == RULE_AGGREGATION:
                    return self._combine(first_match, cfg)
        raise LookupError(f"retention for metric {metric!r} not found")

    @staticmethod
    def _combine(retention: MetricRetentionConfig, aggregation: MetricRetentionConfig) -> MetricRetention:
        return aggregation.retention.with_ranges_of(retention.retention)


class DefaultRetentionProvider(CombinedRetentionProvider):
    """Built-in Graphite-style rule table (DefaultRetentionProvider.java:29-118)."""

    def __init__(self) -> None:
        mk = lambda regexp, default, fn, rets: MetricRetentionConfig(  # noqa: E731
            regexp, default, MetricRetention(fn, rets)
        )
        super().__init__([
            mk("^one_sec.*", False, "avg", {0: 1, DAY: 5, 7 * DAY: 60, 3 * MONTH: 300, YEAR: 600}),
            mk("^five_sec.*", False, "avg", {0: 5, 7 * DAY: 60, 3 * MONTH: 300, YEAR: 600}),
            mk("^one_min.*", False, "avg", {0: 60, 3 * MONTH: 300, YEAR: 600}),
            mk("^five_min.*", False, "avg", {0: 300, YEAR: 600}),
            mk("^ten_min.*", False, "avg", {0: 600}),
            mk("^half_hour.*", False, "avg", {0: 1800}),
            mk("^one_hour.*", False, "avg", {0: 3600}),
            mk("^one_day.*", False, "avg", {0: 86400}),
            mk(".*", True, "avg", {0: 60, MONTH: 300, YEAR: 600}),
        ])


def parse_rollup_xml(xml_text: str) -> list[MetricRetentionConfig]:
    """Parse a ClickHouse ``graphite_rollup`` XML config into rules.

    Shape (doc/install.md:12-152)::

        <graphite_rollup>
          <pattern>
            <regexp>^five_sec</regexp>
            <function>avg</function>
            <retention><age>0</age><precision>5</precision></retention>
            ...
          </pattern>
          <default>...</default>
        </graphite_rollup>
    """
    root = ET.fromstring(xml_text)
    configs: list[MetricRetentionConfig] = []
    default_cfg: MetricRetentionConfig | None = None
    for node in root:
        if node.tag not in ("pattern", "default"):
            continue
        # ClickHouse matches rollup regexps partially (re2 PartialMatch);
        # MetricRetentionConfig.matches is full-anchored (Java Pattern.matches),
        # so wrap the pattern to preserve partial-match semantics.
        raw = node.findtext("regexp")
        regexp = f".*(?:{raw}).*" if raw else ".*"
        function = node.findtext("function") or ""
        retentions: dict[int, int] = {}
        for ret in node.findall("retention"):
            age = int(ret.findtext("age") or 0)
            precision = int(ret.findtext("precision") or 0)
            retentions[age] = precision
        cfg = MetricRetentionConfig(regexp, node.tag == "default", MetricRetention(function, retentions or None))
        if node.tag == "default":
            default_cfg = cfg
        else:
            configs.append(cfg)
    if default_cfg is not None:
        configs.append(default_cfg)
    return configs


#: retention aggregation function name -> (Spark agg fn name, DuckDB SQL fn)
RETENTION_FUNCTIONS = {
    "avg": "avg",
    "min": "min",
    "max": "max",
    "sum": "sum",
    "any": "first",
    "last": "last",
}
