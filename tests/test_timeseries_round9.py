"""Graphite round-9 parity sweep: signature/semantic fixes found by
auditing registry entries against graphite-web signatures —
exponentialMovingAverage duration windows, interpolate(limit),
groupByNode average default, diffSeries argument flattening,
divideSeries per-dividend naming + single-divisor rule, timeStack
start/end, removeEmptySeries xFilesFactor."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.target import evaluate_target
from graphouse_spark.functions.timeseries import (
    diff_series_target,
    divide_series,
    interpolate_series,
    remove_empty_series,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


@pytest.fixture()
def series(spark):
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("s.a", 1000 + i * 60, v))
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0]):
        rows.append(("s.b", 1000 + i * 60, v))
    for i, v in enumerate([100.0, 200.0, 100.0, 100.0]):
        rows.append(("s.c", 1000 + i * 60, v))
    return _mk(spark, rows)


def _metrics(df):
    return {r["metric"] for r in df.select("metric").distinct().collect()}


def _by(df):
    return {(r["metric"], r["ts"]): r["value"] for r in df.collect()}


# ------------------------------------------------- interpolate(limit)


def test_interpolate_limit_caps_gap_length(spark):
    """graphite interpolate(series, limit): only null runs of <= limit
    consecutive points are filled; longer gaps stay null."""
    rows = [
        ("s.a", 0, 0.0),
        ("s.a", 60, None),            # run of 1
        ("s.a", 120, 2.0),
        ("s.a", 180, None),           # run of 3
        ("s.a", 240, None),
        ("s.a", 300, None),
        ("s.a", 360, 6.0),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r["value"] for r in interpolate_series(df, limit=2).collect()}
    assert got[60] == 1.0              # short gap filled
    assert got[180] is None and got[240] is None and got[300] is None
    unlimited = {r["ts"]: r["value"] for r in interpolate_series(df).collect()}
    assert unlimited[240] == 4.0       # no limit -> long gap fills too


def test_interpolate_registry_accepts_limit(spark, series):
    with_gap = series.withColumn(
        "value", F.when(F.col("ts") == 1060, None).otherwise(F.col("value")))
    got = _by(evaluate_target(with_gap, "interpolate(s.a, 1)"))
    assert got[("s.a", 1060)] == 2.0


# ------------------------------------------------- groupByNode default


def test_group_by_node_default_is_average(spark, series):
    """graphite groupByNode's default callback is average, not sum."""
    got = _by(evaluate_target(series, "groupByNode(s.*, 0)"))
    # avg over (1, 10, 100) at ts=1000
    assert got[("s", 1000)] == pytest.approx(37.0, abs=1e-6)


# ------------------------------------------------- diffSeries flatten


def test_diff_series_flattens_all_args(spark, series):
    """diffSeries(a, b, c) = a - (b + c): every arg flattens into one
    list, first series minus the sum of the rest."""
    got = _by(evaluate_target(series, "diffSeries(s.a, s.b, s.c)"))
    assert got[("diffSeries", 1000)] == pytest.approx(1.0 - 110.0)
    assert got[("diffSeries", 1060)] == pytest.approx(2.0 - 220.0)


def test_diff_series_multi_series_first_arg(spark, series):
    """A wildcard first argument contributes its non-first series to
    the subtrahend side (graphite flattens, it does not pair)."""
    got = _by(evaluate_target(series, "diffSeries(s.*)"))
    # s.a - (s.b + s.c)
    assert got[("diffSeries", 1000)] == pytest.approx(1.0 - 110.0)


def test_diff_series_target_direct(spark, series):
    a = series.filter(F.col("metric") == "s.a")
    b = series.filter(F.col("metric") == "s.b")
    c = series.filter(F.col("metric") == "s.c")
    got = {r["ts"]: r["value"] for r in diff_series_target(a, b, c).collect()}
    assert got[1180] == pytest.approx(4.0 - 140.0)


# ------------------------------------------------- divideSeries


def test_divide_series_multi_dividend_names(spark, series):
    """Each dividend keeps its own result series, named
    divideSeries(dividend,divisor) — a multi-dividend call must not
    silently merge into one anonymous series."""
    num = series.filter(F.col("metric") != "s.c")
    den = series.filter(F.col("metric") == "s.c")
    got = {(r["metric"], r["ts"]): r["ratio"]
           for r in divide_series(num, den).collect()}
    assert set(m for m, _ in got) == {
        "divideSeries(s.a,s.c)", "divideSeries(s.b,s.c)"}
    assert got[("divideSeries(s.b,s.c)", 1060)] == pytest.approx(0.1)


def test_divide_series_rejects_multi_divisor(spark, series):
    num = series.filter(F.col("metric") == "s.a")
    den = series.filter(F.col("metric") != "s.a")
    with pytest.raises(ValueError, match="exactly 1"):
        divide_series(num, den)


def test_divide_series_registry_multi_dividend(spark, series):
    got = _by(evaluate_target(series, "divideSeries(s.*, s.c)"))
    # s.c / s.c = 1 everywhere; s.a/s.c at 1060 = 2/200
    assert got[("divideSeries(s.c,s.c)", 1000)] == pytest.approx(1.0)
    assert got[("divideSeries(s.a,s.c)", 1060)] == pytest.approx(0.01)


def test_divide_series_metricless_contract_unchanged(spark, series):
    """Pre-aggregated (ts, value) frames keep the bare (ts, ratio)
    output the entry queries pin."""
    num = series.filter(F.col("metric") == "s.a").drop("metric")
    den = series.filter(F.col("metric") == "s.b").drop("metric")
    out = divide_series(num, den)
    assert out.columns == ["ts", "ratio"]
    got = {r["ts"]: r["ratio"] for r in out.collect()}
    assert got[1000] == pytest.approx(0.1)


# ------------------------------------------------- timeStack start/end


def test_time_stack_start_end(spark, series):
    """graphite timeStack(series, '1min', 1, 3): shift_idx in [start,
    end) — idx 0 (the unshifted copy) is excluded when start=1."""
    got = evaluate_target(series, "timeStack(s.a, '1min', 1, 3)")
    names = _metrics(got)
    assert names == {"s.a#1", "s.a#2"}
    by = _by(got)
    # idx 1 shifts data one minute forward: value at 1000 shows at 1060
    assert by[("s.a#1", 1060)] == 1.0


def test_time_stack_defaults(spark, series):
    """Bare timeStack(series) = unit '1d', start 0, end 7."""
    got = evaluate_target(series.filter(F.col("metric") == "s.a"), "timeStack(s.a)")
    idxs = {int(m.split("#")[1]) for m in _metrics(got)}
    assert idxs == set(range(7))


# ------------------------------------------------- removeEmptySeries xff


def test_remove_empty_series_xff(spark):
    rows = [
        ("s.full", 0, 1.0), ("s.full", 60, 1.0),
        ("s.half", 0, 1.0), ("s.half", 60, None),
        ("s.none", 0, None), ("s.none", 60, None),
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    assert _metrics(remove_empty_series(df)) == {"s.full", "s.half"}
    assert _metrics(remove_empty_series(df, 0.6)) == {"s.full"}
    got = _by(evaluate_target(df, "removeEmptySeries(s.*, 0.6)"))
    assert {m for m, _ in got} == {"s.full"}


# ------------------------------------------------- EMA duration window


def test_ema_accepts_duration_string(spark, series):
    """exponentialMovingAverage('10min') must parse — durations convert
    to a point count at the 60s native step, so '3min' == 3 points."""
    by_str = _by(evaluate_target(series, "exponentialMovingAverage(s.a, '3min')"))
    by_int = _by(evaluate_target(series, "exponentialMovingAverage(s.a, 3)"))
    assert by_str == by_int
    assert len(by_str) > 0
