"""Properties-file configuration: the reference's deployment surface.

The reference is configured entirely through a Java properties file
(``graphouse-default.properties``, 138 keys, overridden by a
site-local ``graphouse.properties``) with Spring ``${key}``
placeholder interpolation. A migrating operator has that file; this
module lets them drop it in unchanged:

    python -m graphouse_spark serve --properties graphouse.properties \
        --data /lake/data --metrics /lake/metrics --checkpoint /lake/ckpt

Keys that configure ClickHouse connection pooling, Jetty buffer sizes
and retry cadence have no analog here (Spark owns those concerns) and
are accepted-and-ignored, exactly like unknown keys are in the
reference's Spring context. The LOAD-BEARING keys — validation limits,
serving limits, ports, batcher shape, autohide policy, ingest cadence
— map onto the engine's constructor arguments via
:func:`settings_from_properties`.

Reference parity map (graphouse-default.properties:1-138):

========================================================= ==============================
property                                                  maps to
========================================================= ==============================
graphouse.cacher.bind-address / .port                     serve --host / --graphite-port
graphouse.http.bind-address / .port                       serve --host / --http-port
graphouse.cacher.max-batch-time-seconds                   IngestConfig.trigger_seconds
graphouse.metric-data.max-metrics-per-query               GraphouseService(max_metrics_per_query=)
graphouse.metric-data.max-points-per-metric               GraphouseService(max_points_per_metric=)
graphouse.tree.max-subdirs-per-dir / max-metrics-per-dir  GraphouseService(max_subdirs_per_dir=, max_metrics_per_dir=)
graphouse.metric-validation.min/max-length                MetricValidator(min_length=, max_length=)
graphouse.metric-validation.min/max-levels                MetricValidator(min_dots=, max_dots=)  [value injected AS the dot count, MetricsConfig.java:69-73]
graphouse.metric-validation.regexp                        MetricValidator(metric_regexp=)
graphouse.tree.dir-content.batcher.max-parallel-requests  DirContentBatcher(max_parallel=)
graphouse.tree.dir-content.batcher.max-batch-size         DirContentBatcher(max_batch_size=)
graphouse.tree.dir-content.batcher.aggregation-time-millis DirContentBatcher(batch_aggregation_ms=)
graphouse.autohide.enabled / .max-values-count /          maintenance.run_autohide(max_values_count=,
  .missing-days / .run-delay-minutes                        retention_days=) + scheduler cadence
graphouse.host-metric-redirect.enabled / .dir /           sources/graphite.redirect_host_metrics
  .postfixes
graphouse.clickhouse.retention-config                     CombinedRetentionProvider (rollup config path)
graphouse.search.refresh-seconds                          tree refresh cadence (serve loop)
graphouse.clickhouse.data-table / .metric-tree-table      table subpaths under a lake root
========================================================= ==============================
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def parse_properties(text: str) -> dict[str, str]:
    """Parse Java ``.properties`` content: ``#``/``!`` comments,
    ``key=value`` (or ``key: value``), trailing-backslash line
    continuations, and Spring-style ``${key}`` placeholder
    interpolation against the file's own keys (the reference's
    ``graphouse.clickhouse.hosts=${graphouse.clickhouse.host}``
    pattern). Unknown placeholders are left verbatim."""
    props: dict[str, str] = {}
    logical: list[str] = []
    pending: str | None = None
    for raw in text.splitlines():
        if pending is None:
            stripped = raw.strip()
            if not stripped or stripped[0] in "#!":
                continue
            line = raw
        else:
            # continuation content: leading whitespace stripped, '#'
            # is literal (Java Properties semantics)
            line = pending + raw.lstrip()
            pending = None
        # a trailing odd number of backslashes continues the line
        m = re.search(r"(\\+)$", line)
        if m and len(m.group(1)) % 2 == 1:
            pending = line[: m.start()] + m.group(1)[:-1]
            continue
        logical.append(line)
    if pending is not None:
        logical.append(pending)
    def unescape(s: str) -> str:
        # Java Properties escape processing: \\ -> \, \t/\n/\r/\f,
        # \uXXXX, and a backslash before any other char is dropped
        out, i, n = [], 0, len(s)
        while i < n:
            c = s[i]
            if c != "\\" or i + 1 >= n:
                out.append(c)
                i += 1
                continue
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= n:
                try:
                    out.append(chr(int(s[i + 2:i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            out.append({"t": "\t", "n": "\n", "r": "\r",
                        "f": "\f"}.get(nxt, nxt))
            i += 2
        return "".join(out)

    for line in logical:
        m = re.match(r"\s*([^=:\s]+)\s*[=:]\s*(.*)$", line)
        if not m:
            continue
        props[unescape(m.group(1))] = unescape(m.group(2).strip())
    # ${key} interpolation, a few passes for chained placeholders
    for _ in range(5):
        changed = False
        for k, v in props.items():
            def repl(mm):
                return props.get(mm.group(1), mm.group(0))
            nv = re.sub(r"\$\{([^}]+)\}", repl, v)
            if nv != v:
                props[k] = nv
                changed = True
        if not changed:
            break
    return props


def load_properties(path: str) -> dict[str, str]:
    with open(path, encoding="utf-8") as f:
        return parse_properties(f.read())


def _get_int(props: dict, key: str, default: int) -> int:
    v = props.get(key, "")
    try:
        return int(v)
    except (TypeError, ValueError):
        return default


def _get_bool(props: dict, key: str, default: bool) -> bool:
    v = props.get(key, "").strip().lower()
    if v in ("true", "1", "yes", "on"):
        return True
    if v in ("false", "0", "no", "off"):
        return False
    return default


@dataclass
class GraphouseSettings:
    """The reference's load-bearing knobs, resolved from a properties
    file (defaults = graphouse-default.properties values)."""

    # listeners (MetricServer.java / GraphouseWebServer.java)
    graphite_host: str = ""          # graphouse.cacher.bind-address
    graphite_port: int = 2003        # graphouse.cacher.port
    http_host: str = ""              # graphouse.http.bind-address
    http_port: int = 2005            # graphouse.http.port
    # ingest cadence: the reference flushes batches between min and max
    # batch time (MetricCacher.java); a micro-batch trigger has one
    # cadence — the max is the user-visible durability bound
    trigger_seconds: int = 5         # graphouse.cacher.max-batch-time-seconds
    # serving limits (MetricDataServiceServlet 413 / dir limits)
    max_metrics_per_query: int = -1  # graphouse.metric-data.max-metrics-per-query
    # ENGINE EXTENSION: seriesByTag term sets with no non-empty match
    # are refused (graphite-web's TagDB posture); this re-enables the
    # one-pass all-negative evaluator for trusted deployments
    tags_allow_all_negative: bool = False  # graphouse.tags.allow-all-negative
    max_points_per_metric: int = -1  # graphouse.metric-data.max-points-per-metric
    max_subdirs_per_dir: int = -1    # graphouse.tree.max-subdirs-per-dir
    max_metrics_per_dir: int = -1    # graphouse.tree.max-metrics-per-dir
    # validation (MetricValidator.java:17-25): the reference injects
    # graphouse.metric-validation.min-levels/max-levels DIRECTLY as
    # minDots/maxDots (MetricsConfig.java:69-73) — despite the
    # property name, the value IS the dot count. No conversion.
    validation_min_length: int = 5
    validation_max_length: int = 500
    validation_min_dots: int = 2     # min-levels default (graphouse-default.properties:126)
    validation_max_dots: int = 20    # max-levels default (graphouse-default.properties:127)
    validation_regexp: str = r"[-_0-9a-zA-Z\.]*$"
    # X6 dir-content batcher
    batcher_max_parallel: int = 3
    batcher_max_batch_size: int = 2000
    batcher_aggregation_ms: int = 50
    # autohide job (AutoHideService.java)
    autohide_enabled: bool = False
    autohide_max_values_count: int = 200
    autohide_missing_days: int = 7
    autohide_run_delay_minutes: int = 30
    # host-metric redirect (S4)
    redirect_enabled: bool = False
    redirect_dir: str = ""
    redirect_postfixes: tuple[str, ...] = ()
    # tree refresh cadence (MetricSearch.java refresh loop)
    search_refresh_seconds: int = 60
    # retention config path (graphite_rollup XML)
    retention_config: str = ""
    # table names -> lake subdirectories (data/metrics under a root)
    data_table: str = "data"
    metric_tree_table: str = "metrics"
    #: every key the file carried, for pass-through inspection
    raw: dict = field(default_factory=dict)

    def validator(self):
        from graphouse_spark.paths import MetricValidator

        return MetricValidator(
            metric_regexp=self.validation_regexp,
            min_length=self.validation_min_length,
            max_length=self.validation_max_length,
            min_dots=self.validation_min_dots,
            max_dots=self.validation_max_dots,
        )


def settings_from_properties(props: dict[str, str]) -> GraphouseSettings:
    """Resolve a parsed properties map into :class:`GraphouseSettings`.

    min/max-levels pass through UNCHANGED as the validator's dot
    counts: the reference injects the property values directly as
    minDots/maxDots (MetricsConfig.java:69-73 →
    MetricValidator.java:21-25), so a drop-in properties file must
    behave identically — the property is (mis)named "levels" but the
    comparison at MetricValidator.java:58 is against the dot count.
    """
    g = GraphouseSettings(raw=dict(props))
    g.graphite_host = props.get("graphouse.cacher.bind-address", "") or ""
    g.graphite_port = _get_int(props, "graphouse.cacher.port", 2003)
    g.http_host = props.get("graphouse.http.bind-address", "") or ""
    g.http_port = _get_int(props, "graphouse.http.port", 2005)
    g.trigger_seconds = _get_int(
        props, "graphouse.cacher.max-batch-time-seconds", 5)
    g.max_metrics_per_query = _get_int(
        props, "graphouse.metric-data.max-metrics-per-query", -1)
    g.tags_allow_all_negative = _get_bool(
        props, "graphouse.tags.allow-all-negative", False)
    g.max_points_per_metric = _get_int(
        props, "graphouse.metric-data.max-points-per-metric", -1)
    g.max_subdirs_per_dir = _get_int(
        props, "graphouse.tree.max-subdirs-per-dir", -1)
    g.max_metrics_per_dir = _get_int(
        props, "graphouse.tree.max-metrics-per-dir", -1)
    g.validation_min_length = _get_int(
        props, "graphouse.metric-validation.min-length", 5)
    g.validation_max_length = _get_int(
        props, "graphouse.metric-validation.max-length", 500)
    g.validation_min_dots = _get_int(
        props, "graphouse.metric-validation.min-levels", 2)
    g.validation_max_dots = _get_int(
        props, "graphouse.metric-validation.max-levels", 20)
    g.validation_regexp = props.get(
        "graphouse.metric-validation.regexp", g.validation_regexp)
    g.batcher_max_parallel = _get_int(
        props, "graphouse.tree.dir-content.batcher.max-parallel-requests", 3)
    g.batcher_max_batch_size = _get_int(
        props, "graphouse.tree.dir-content.batcher.max-batch-size", 2000)
    g.batcher_aggregation_ms = _get_int(
        props, "graphouse.tree.dir-content.batcher.aggregation-time-millis",
        50)
    g.autohide_enabled = _get_bool(props, "graphouse.autohide.enabled", False)
    g.autohide_max_values_count = _get_int(
        props, "graphouse.autohide.max-values-count", 200)
    g.autohide_missing_days = _get_int(
        props, "graphouse.autohide.missing-days", 7)
    g.autohide_run_delay_minutes = _get_int(
        props, "graphouse.autohide.run-delay-minutes", 30)
    g.redirect_enabled = _get_bool(
        props, "graphouse.host-metric-redirect.enabled", False)
    g.redirect_dir = props.get("graphouse.host-metric-redirect.dir", "")
    postfixes = props.get("graphouse.host-metric-redirect.postfixes", "")
    g.redirect_postfixes = tuple(
        p.strip() for p in postfixes.split(",") if p.strip())
    g.search_refresh_seconds = _get_int(
        props, "graphouse.search.refresh-seconds", 60)
    g.retention_config = props.get(
        "graphouse.clickhouse.retention-config", "")
    g.data_table = props.get("graphouse.clickhouse.data-table", "data")
    g.metric_tree_table = props.get(
        "graphouse.clickhouse.metric-tree-table", "metrics")
    return g


def load_settings(path: str) -> GraphouseSettings:
    """``graphouse.properties`` file -> resolved settings."""
    return settings_from_properties(load_properties(path))
