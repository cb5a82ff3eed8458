"""Properties-file config surface: the reference is deployed with a
graphouse.properties file (graphouse-default.properties, 138 keys);
config.py lets that file drop in unchanged. Parser semantics, the
load-bearing key mapping, and the serve-path wiring."""

import pytest

from graphouse_spark.config import (
    GraphouseSettings, load_settings, parse_properties,
    settings_from_properties)

REFERENCE_DEFAULTS = "/root/reference/src/main/resources/graphouse-default.properties"


def test_parse_basic_and_comments():
    props = parse_properties(
        "# comment\n"
        "! also comment\n"
        "\n"
        "a.b=1\n"
        "c.d = spaced value \n"
        "empty=\n"
        "colon: v\n")
    assert props == {"a.b": "1", "c.d": "spaced value",
                     "empty": "", "colon": "v"}


def test_parse_line_continuation():
    props = parse_properties(
        "key=one,\\\n"
        "    two,\\\n"
        "    three\n"
        "next=x\n")
    assert props["key"] == "one,two,three"
    assert props["next"] == "x"
    # escaped backslash at EOL is a literal backslash, not a
    # continuation (and \\ unescapes to \ per Java Properties)
    props = parse_properties("p=a\\\\\nq=b\n")
    assert props["p"] == "a\\" and props["q"] == "b"


def test_parse_placeholder_interpolation():
    """The reference's own pattern:
    graphouse.clickhouse.hosts=${graphouse.clickhouse.host}"""
    props = parse_properties(
        "graphouse.clickhouse.host=localhost\n"
        "graphouse.clickhouse.hosts=${graphouse.clickhouse.host}\n"
        "chained=${graphouse.clickhouse.hosts}:8123\n"
        "unknown=${nope}\n")
    assert props["graphouse.clickhouse.hosts"] == "localhost"
    assert props["chained"] == "localhost:8123"
    assert props["unknown"] == "${nope}"  # left verbatim


def test_reference_default_file_parses():
    """The actual shipped defaults file round-trips: every key the
    reference documents resolves, including its ${} indirections."""
    settings = load_settings(REFERENCE_DEFAULTS)
    assert settings.graphite_port == 2003
    assert settings.http_port == 2005
    assert settings.trigger_seconds == 5      # max-batch-time-seconds
    assert settings.max_metrics_per_query == -1
    assert settings.max_points_per_metric == -1
    assert settings.max_subdirs_per_dir == -1
    assert settings.validation_min_length == 5
    assert settings.validation_max_length == 500
    assert settings.validation_min_dots == 2   # min-levels=2, injected as-is
    assert settings.validation_max_dots == 20  # max-levels=20, injected as-is
    assert settings.validation_regexp == r"[-_0-9a-zA-Z\.]*$"
    assert settings.batcher_max_parallel == 3
    assert settings.batcher_max_batch_size == 2000
    assert settings.batcher_aggregation_ms == 50
    assert settings.autohide_enabled is False
    assert settings.autohide_max_values_count == 200
    assert settings.autohide_missing_days == 7
    assert settings.search_refresh_seconds == 60
    assert settings.data_table == "data"
    assert settings.metric_tree_table == "metrics"
    # the ${} indirection in the defaults file resolved
    assert settings.raw["graphouse.clickhouse.hosts"] == "localhost"
    assert settings.raw["graphouse.clickhouse.data-write-table"] == "data"


def test_settings_validator_passes_levels_through_as_dots():
    # The reference injects min-levels/max-levels DIRECTLY as
    # minDots/maxDots (MetricsConfig.java:69-73) — the property is
    # (mis)named "levels" but the MetricValidator.java:58 comparison
    # is against the dot count. A drop-in properties file must match.
    s = settings_from_properties({
        "graphouse.metric-validation.min-length": "3",
        "graphouse.metric-validation.max-length": "40",
        "graphouse.metric-validation.min-levels": "3",
        "graphouse.metric-validation.max-levels": "4",
        "graphouse.metric-validation.regexp": r"[a-z\.]*$",
    })
    assert s.validation_min_dots == 3
    assert s.validation_max_dots == 4
    v = s.validator()
    assert not v.validate("a.b")          # 1 dot < min 3
    assert not v.validate("aa.bb.cc")     # 2 dots < min 3
    assert v.validate("a.b.c.d")          # 3 dots
    assert v.validate("a.b.c.d.e")        # 4 dots == max
    assert not v.validate("a.b.c.d.e.f")  # 5 dots > max 4
    assert not v.validate("A.B.C.D")      # regexp forbids uppercase
    assert not v.validate("a" * 41)       # over max-length


def test_settings_redirect_postfix_list():
    s = settings_from_properties({
        "graphouse.host-metric-redirect.enabled": "true",
        "graphouse.host-metric-redirect.dir": "one_min.hosts",
        "graphouse.host-metric-redirect.postfixes": "cpu, mem ,disk",
    })
    assert s.redirect_enabled is True
    assert s.redirect_dir == "one_min.hosts"
    assert s.redirect_postfixes == ("cpu", "mem", "disk")


def test_unknown_and_unmapped_keys_are_kept_not_fatal():
    s = settings_from_properties({
        "graphouse.clickhouse.socket-timeout-seconds": "600",
        "some.future.key": "x",
    })
    assert isinstance(s, GraphouseSettings)
    assert s.raw["some.future.key"] == "x"


def test_serve_uses_properties_with_cli_override(spark, tmp_path):
    """serve --properties: file values apply (validator limits, serving
    limits); explicit CLI flags override file ports."""
    from graphouse_spark.__main__ import build_parser, run_serve

    prop_file = tmp_path / "graphouse.properties"
    prop_file.write_text(
        "graphouse.http.port=59999\n"            # overridden by CLI 0
        "graphouse.cacher.port=0\n"              # listener off
        "graphouse.metric-data.max-metrics-per-query=7\n"
        "graphouse.metric-data.max-points-per-metric=99\n"
        "graphouse.tree.max-subdirs-per-dir=11\n"
        "graphouse.tree.max-metrics-per-dir=12\n"
        "graphouse.cacher.max-batch-time-seconds=2\n")
    args = build_parser().parse_args([
        "serve",
        "--data", str(tmp_path / "data"),
        "--metrics", str(tmp_path / "metrics"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--properties", str(prop_file),
        "--http-port", "0",  # explicit CLI beats the file's 59999
    ])
    svc, http, query = run_serve(args, spark=spark, block=False)
    try:
        assert query is None  # cacher.port=0 disabled the listener
        assert http.server_address[1] != 59999  # CLI override won
        assert svc.max_metrics_per_query == 7
        assert svc.data_service.max_points_per_metric == 99
        assert svc.tree.max_subdirs == 11
        assert svc.tree.max_metrics == 12
    finally:
        http.shutdown()


def test_ingest_config_honors_properties_validator(spark, tmp_path):
    """A site that narrows metric-validation via properties sees the
    ingest path reject accordingly (reference: MetricValidator is
    constructed from exactly these keys)."""
    from pyspark.sql import functions as F

    from graphouse_spark.config import settings_from_properties
    from graphouse_spark.sources.graphite import parse_lines

    s = settings_from_properties({
        "graphouse.metric-validation.min-levels": "4",
        "graphouse.metric-validation.max-levels": "20",
    })
    raw = spark.createDataFrame(
        [("one_min.a.b.c 1.0 1000",),      # 3 dots: rejected at minDots=4
         ("one_min.a.b.c.d 2.0 1000",)],   # 4 dots: accepted
        "value string")
    parsed = parse_lines(raw, updated=F.lit(1), validator=s.validator())
    names = [r["name"] for r in parsed.select("name").collect()]
    assert names == ["one_min.a.b.c.d"]
