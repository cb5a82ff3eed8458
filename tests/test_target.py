"""Render-target parser: grammar + engine-side evaluation parity."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.target import Call, Path, evaluate_target, parse_target


def test_parse_nested_call_with_literals():
    t = parse_target("summarize(keepLastValue(events.*.cpu), 300, 'avg')")
    assert isinstance(t, Call) and t.name == "summarize"
    inner = t.args[0]
    assert isinstance(inner, Call) and inner.name == "keepLastValue"
    assert isinstance(inner.args[0], Path) and inner.args[0].glob == "events.*.cpu"
    assert t.args[1] == 300 and t.args[2] == "avg"


def test_parse_rejects_garbage():
    for bad in ["scale(events.cpu", "scale)x(", "movingAverage(a.b, 5) trailing", ""]:
        with pytest.raises(ValueError):
            parse_target(bad)


@pytest.fixture()
def series(spark):
    rows = [("events.click", t * 60, float(v))
            for t, v in enumerate([1, 4, 9, 16, 25])]
    rows += [("events.view", t * 60, float(v)) for t, v in enumerate([2, 2, 2, 2, 2])]
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_bare_path_glob_selects_series(series):
    got = evaluate_target(series, "events.*")
    assert got.count() == 10
    got = evaluate_target(series, "events.click")
    assert {r["metric"] for r in got.collect()} == {"events.click"}
    assert evaluate_target(series, "nomatch.*").count() == 0


def test_evaluate_equals_direct_composition(series):
    from graphouse_spark.functions.timeseries import moving_average

    got = evaluate_target(series, "movingAverage(events.click, 2)").collect()
    want = (
        moving_average(series.filter(F.col("metric") == "events.click"), 2)
        .select("metric", "ts", F.col("moving_avg").alias("value"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_evaluate_nested_pipeline(series):
    # scale(sumSeries(events.*), 2): click+view summed then doubled
    got = {r["ts"]: r["value"]
           for r in evaluate_target(series, "scale(sumSeries(events.*), 2)").collect()}
    assert got == {0: 6.0, 60: 12.0, 120: 22.0, 180: 36.0, 240: 54.0}


def test_unknown_function_lists_supported(series):
    # 'stacked' graduated to a registered pass-through in round 8, so
    # the canary must be a name graphite never had
    with pytest.raises(ValueError, match="unsupported function 'frobnicate'"):
        evaluate_target(series, "frobnicate(events.*)")
