"""Graphite round-6 transforms: filter-family complements, percentile
trims, multi-series arithmetic, multi-node grouping, constant lines,
name sort — plus the render-target registry entries for all of them."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.target import evaluate_target
from graphouse_spark.functions.timeseries import (
    aggregate_line,
    average_below,
    count_series,
    current_below,
    diff_series,
    group_by_nodes,
    maximum_below,
    minimum_above,
    multiply_series,
    remove_above_percentile,
    remove_below_percentile,
    sort_by_name,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


@pytest.fixture()
def series(spark):
    # a: 1..4 (min 1, max 4, mean 2.5, last 4); b: 10..40; c flat 100
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("s.a", i * 60, v))
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0]):
        rows.append(("s.b", i * 60, v))
    for i in range(4):
        rows.append(("s.c", i * 60, 100.0))
    return _mk(spark, rows)


def _metrics(df):
    return {r["metric"] for r in df.select("metric").distinct().collect()}


def test_filter_family_complements(series):
    assert _metrics(minimum_above(series, 5.0)) == {"s.b", "s.c"}
    assert _metrics(maximum_below(series, 50.0)) == {"s.a", "s.b"}
    assert _metrics(average_below(series, 25.0)) == {"s.a", "s.b"}
    assert _metrics(current_below(series, 40.0)) == {"s.a", "s.b"}


def test_remove_percentile_nulls_keep_grid(series):
    # graphite rank p50 of s.a [1,2,3,4]: ceil(0.5 * 5) = rank 3 -> 3.0;
    # only 4 nulls out above it (grid preserved)
    out = {(r["metric"], r["ts"]): r["value"]
           for r in remove_above_percentile(series, 50.0).collect()}
    assert len(out) == 12  # grid intact
    assert out[("s.a", 0)] == 1.0 and out[("s.a", 60)] == 2.0
    assert out[("s.a", 120)] == 3.0 and out[("s.a", 180)] is None

    out = {(r["metric"], r["ts"]): r["value"]
           for r in remove_below_percentile(series, 50.0).collect()}
    assert out[("s.a", 0)] is None and out[("s.a", 60)] is None
    assert out[("s.a", 120)] == 3.0 and out[("s.a", 180)] == 4.0


def test_multiply_and_count_and_diff(series, spark):
    prod = {r["ts"]: (r["product_value"], r["n_series"])
            for r in multiply_series(series).collect()}
    assert prod[0] == (1.0 * 10.0 * 100.0, 3)
    assert prod[180] == (4.0 * 40.0 * 100.0, 3)

    cnt = {r["ts"]: r["n_series"] for r in count_series(series).collect()}
    assert cnt == {0: 3, 60: 3, 120: 3, 180: 3}

    # diff: a - (b + c)
    d = {r["ts"]: r["value"]
         for r in diff_series(series.filter(F.col("metric") == "s.a"),
                              series.filter(F.col("metric") != "s.a")).collect()}
    assert d[0] == 1.0 - 110.0
    assert d[180] == 4.0 - 140.0

    # missing subtrahend points subtract nothing
    lone = _mk(spark, [("s.a", 999, 7.0)])
    d2 = diff_series(lone, series.filter(F.col("metric") != "s.a")).collect()
    assert d2[0]["value"] == 7.0


def test_group_by_nodes_and_aggregate_line(series):
    rows = [("dc1.web.cpu", 0, 1.0), ("dc1.db.cpu", 0, 5.0),
            ("dc2.web.cpu", 0, 3.0), ("dc1.web.cpu", 60, 7.0)]
    g = {(r["metric"], r["ts"]): r["value"]
         for r in group_by_nodes(_mk(series.sparkSession, rows), "max", [0, 2]).collect()}
    assert g[("dc1.cpu", 0)] == 5.0 and g[("dc2.cpu", 0)] == 3.0
    assert g[("dc1.cpu", 60)] == 7.0

    line = {r["metric"]: r["line_value"] for r in aggregate_line(series, "avg").collect()}
    assert line == {"s.a": 2.5, "s.b": 25.0, "s.c": 100.0}
    # graphite's aggFuncs table (median included) resolves here too
    med = {r["metric"]: r["line_value"]
           for r in aggregate_line(series, "median").collect()}
    assert med["s.a"] == 2.5
    with pytest.raises(ValueError):
        aggregate_line(series, "no-such-agg")


def test_sort_by_name_rank(series):
    ranks = {r["metric"]: r["rank"] for r in sort_by_name(series).collect()}
    assert ranks == {"s.a": 1, "s.b": 2, "s.c": 3}


def test_render_target_round6_registry(series):
    # bare-word keyword args parse as strings, dotted args as series
    out = evaluate_target(series, "groupByNodes(s.*, max, 0)").collect()
    assert {(r["metric"], r["ts"], r["value"]) for r in out} >= {("s", 0, 100.0)}

    out = evaluate_target(series, "diffSeries(s.a, s.b)").collect()
    vals = {r["ts"]: r["value"] for r in out}
    assert vals[0] == -9.0 and vals[180] == -36.0

    out = evaluate_target(series, "sumSeries(maximumBelow(s.*, 50.0))").collect()
    assert {r["ts"]: r["value"] for r in out}[0] == 11.0

    # composition of a round-6 filter into a round-1 transform
    out = evaluate_target(series, "movingAverage(minimumAbove(s.*, 5.0), 2)")
    assert _metrics(out) == {"s.b", "s.c"}
