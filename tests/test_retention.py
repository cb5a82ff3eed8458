"""Ports of CombinedRetentionProviderTest.java and MetricDataQueryParamsTest.java."""

import pytest

from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import (
    CombinedRetentionProvider,
    DefaultRetentionProvider,
    MetricRetention,
    MetricRetentionConfig,
    parse_rollup_xml,
)


@pytest.fixture()
def provider():
    # CombinedRetentionProviderTest.java:14-65 (regex quirks preserved)
    return CombinedRetentionProvider([
        MetricRetentionConfig(".*^one_sec.*", False, MetricRetention("", {0: 1, 3600: 5, 86400: 60})),
        MetricRetentionConfig(".*^one_hour.*", False, MetricRetention("", {0: 3600, 31536000: 86400})),
        MetricRetentionConfig(".*max$.*", False, MetricRetention("max", {0: 0})),
        MetricRetentionConfig(".*min$.*", False, MetricRetention("min", {0: 0})),
        MetricRetentionConfig(".*^one_day.*.count$.*", False, MetricRetention("sum", {0: 86400})),
        MetricRetentionConfig(
            ".*.*", True, MetricRetention("avg", {0: 60, 7776000: 600, 31536000: 3600, 63072000: 86400})
        ),
    ])


def test_one_min_avg(provider):
    r = provider.get_retention("one_min.dir.name")
    assert r.function == "avg"
    assert r.ranges == [(0, 60), (7776000, 600), (31536000, 3600), (63072000, 86400)]


def test_one_min_max(provider):
    r = provider.get_retention("one_min.dir.name.max")
    assert r.function == "max"
    assert r.ranges == [(0, 60), (7776000, 600), (31536000, 3600), (63072000, 86400)]


def test_one_sec_min(provider):
    r = provider.get_retention("one_sec.dir.name.min")
    assert r.function == "min"
    assert r.ranges == [(0, 1), (3600, 5), (86400, 60)]


def test_one_hour_avg(provider):
    r = provider.get_retention("one_hour.dir.name")
    assert r.function == "avg"
    assert r.ranges == [(0, 3600), (31536000, 86400)]


def test_one_day_sum(provider):
    r = provider.get_retention("one_day.dir.name.count")
    assert r.function == "sum"
    assert r.ranges == [(0, 86400)]


def test_step_size_lookup():
    r = MetricRetention("avg", {0: 1, 3600: 5, 86400: 60})
    assert r.step_size(-5) == 1  # clamped to 0
    assert r.step_size(0) == 1
    assert r.step_size(3599) == 1
    assert r.step_size(3600) == 5
    assert r.step_size(86399) == 5
    assert r.step_size(86400) == 60
    assert r.step_size(10**9) == 60


def test_default_provider():
    p = DefaultRetentionProvider()
    assert p.get_retention("five_sec.srv.cpu").step_size(0) == 5
    assert p.get_retention("five_sec.srv.cpu").step_size(8 * 86400) == 60
    assert p.get_retention("one_day.x.y").step_size(0) == 86400
    assert p.get_retention("custom.app.req").ranges == [(0, 60), (30 * 86400, 300), (360 * 86400, 600)]


def test_query_params():
    # MetricDataQueryParamsTest.test — single avg/{0:60} retention
    ret = MetricRetention("avg", {0: 60})
    p = MetricDataQueryParams.create([ret], 1542199569, 1542200159, -1, now_seconds=1542200159)
    assert p == MetricDataQueryParams(1542199560, 1542200100, 60)


def test_query_params_limit():
    # MetricDataQueryParamsTest.testLimit — step inflates 60 -> 300
    ret = MetricRetention("avg", {0: 60})
    p = MetricDataQueryParams.create([ret], 1542199569, 1542451570, 1000, now_seconds=1542451570)
    assert p == MetricDataQueryParams(1542199500, 1542451500, 300)


def test_rollup_xml_roundtrip():
    xml = """
    <graphite_rollup>
      <pattern>
        <regexp>^five_sec</regexp>
        <function>avg</function>
        <retention><age>0</age><precision>5</precision></retention>
        <retention><age>604800</age><precision>60</precision></retention>
      </pattern>
      <pattern>
        <regexp>max$</regexp>
        <function>max</function>
      </pattern>
      <default>
        <function>avg</function>
        <retention><age>0</age><precision>60</precision></retention>
      </default>
    </graphite_rollup>
    """
    configs = parse_rollup_xml(xml)
    assert len(configs) == 3
    assert configs[-1].is_default
    provider = CombinedRetentionProvider(configs)
    r = provider.get_retention("five_sec.srv.cpu")
    assert r.function == "avg"
    assert r.ranges == [(0, 5), (604800, 60)]
    # AGGREGATION-only pattern combines with default's ranges
    r2 = provider.get_retention("custom.app.max")
    assert r2.function == "max"
    assert r2.ranges == [(0, 60)]
