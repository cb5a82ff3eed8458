"""Graphite round-7: the generic selector/filter family
(highest/lowest/filterSeries/limit), alias family, fallbackSeries,
removeEmptySeries, and scalar transforms — plus their render-target
registry entries."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.target import evaluate_target
from graphouse_spark.functions.timeseries import (
    alias_by_metric,
    alias_series,
    fallback_series,
    filter_series,
    is_non_null,
    limit_series,
    remove_above_value,
    remove_empty_series,
    round_series,
    select_series_by,
    sigmoid_series,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


@pytest.fixture()
def series(spark):
    # a: 1..4 (mean 2.5, current 4); b: 10..40 (mean 25, current 40);
    # c: 100,100,100,1 (mean 75.25, current 1)
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append(("s.a", i * 60, v))
    for i, v in enumerate([10.0, 20.0, 30.0, 40.0]):
        rows.append(("s.b", i * 60, v))
    for i, v in enumerate([100.0, 100.0, 100.0, 1.0]):
        rows.append(("s.c", i * 60, v))
    return _mk(spark, rows)


def _metrics(df):
    return {r["metric"] for r in df.select("metric").distinct().collect()}


def test_select_series_by_stats(series):
    assert _metrics(select_series_by(series, "average", 1)) == {"s.c"}
    assert _metrics(select_series_by(series, "average", 2)) == {"s.b", "s.c"}
    assert _metrics(select_series_by(series, "current", 1)) == {"s.b"}
    assert _metrics(select_series_by(series, "current", 1, lowest=True)) == {"s.c"}
    assert _metrics(select_series_by(series, "max", 1, lowest=True)) == {"s.a"}
    # full series come back, not just names
    assert select_series_by(series, "average", 1).count() == 4
    with pytest.raises(ValueError, match="unknown series statistic"):
        select_series_by(series, "nope", 1).collect()


def test_filter_series_ops(series):
    assert _metrics(filter_series(series, "average", ">", 20.0)) == {"s.b", "s.c"}
    assert _metrics(filter_series(series, "current", "<=", 4.0)) == {"s.a", "s.c"}
    assert _metrics(filter_series(series, "min", "=", 1.0)) == {"s.a", "s.c"}
    assert _metrics(filter_series(series, "sum", "!=", 10.0)) == {"s.b", "s.c"}
    with pytest.raises(ValueError, match="unknown operator"):
        filter_series(series, "average", "~", 1.0).collect()


def test_limit_and_remove_empty(spark, series):
    assert _metrics(limit_series(series, 2)) == {"s.a", "s.b"}  # name order
    with_null = series.withColumn(
        "value", F.when(F.col("metric") != "s.a", F.col("value"))
    )
    assert _metrics(remove_empty_series(with_null)) == {"s.b", "s.c"}


def test_fallback_series(spark, series):
    empty = series.filter(F.col("value") < -1)
    # empty primary -> fallback shows
    assert fallback_series(empty, series).count() == 12
    # non-empty primary -> fallback hidden
    only_a = series.filter(F.col("metric") == "s.a")
    out = fallback_series(only_a, series)
    assert _metrics(out) == {"s.a"} and out.count() == 4


def test_alias_family(series):
    assert _metrics(alias_series(series, "x")) == {"x"}
    assert _metrics(alias_by_metric(series)) == {"a", "b", "c"}


def test_scalar_transforms(spark):
    s = _mk(spark, [("m", 0, 0.0), ("m", 60, 149.6), ("m", 120, None)])
    nn = {r["ts"]: r["value"] for r in is_non_null(s).collect()}
    assert nn == {0: 1.0, 60: 1.0, 120: 0.0}
    r = {r["ts"]: r["value"] for r in round_series(s, 0).collect()}
    assert r[60] == 150.0
    sig = {r["ts"]: r["value"] for r in sigmoid_series(s).collect()}
    assert sig[0] == 0.5 and sig[120] is None
    nulled = remove_above_value(s, 100.0)
    assert {r["ts"]: r["value"] for r in nulled.collect()}[60] is None


def test_render_targets_round7(series):
    out = evaluate_target(series, "highestAverage(s.*, 1)")
    assert _metrics(out) == {"s.c"}
    out = evaluate_target(series, "lowestCurrent(s.*, 1)")
    assert _metrics(out) == {"s.c"}
    out = evaluate_target(series, "filterSeries(s.*, 'average', '>', 20)")
    assert _metrics(out) == {"s.b", "s.c"}
    out = evaluate_target(series, "limit(aliasByMetric(s.*), 2)")
    assert _metrics(out) == {"a", "b"}
    out = evaluate_target(series, "sigmoid(round(alias(s.a, 'zero'), 0))")
    assert _metrics(out) == {"zero"}
    out = evaluate_target(series, "fallbackSeries(s.z, s.a)")
    assert out.count() == 4


def test_aggregate_group_substr(spark, series):
    from graphouse_spark.functions.timeseries import (
        aggregate_series,
        group_series,
        substr_series,
    )

    agg = {r["ts"]: r["value"] for r in aggregate_series(series, "max").collect()}
    assert agg[0] == 100.0 and agg[180] == 40.0  # c drops to 1 at ts=180
    rng = {r["ts"]: r["value"] for r in aggregate_series(series, "range").collect()}
    assert rng[0] == 99.0  # 100 - 1
    med = {r["ts"]: r["value"] for r in aggregate_series(series, "median").collect()}
    assert med[0] == 10.0
    with pytest.raises(ValueError, match="unknown aggregate"):
        aggregate_series(series, "nope").collect()

    a = series.filter(F.col("metric") == "s.a")
    b = series.filter(F.col("metric") == "s.b")
    assert group_series(a, b).count() == 8
    with pytest.raises(ValueError, match="at least one"):
        group_series()

    assert _metrics(substr_series(series, 1)) == {"a", "b", "c"}
    assert _metrics(substr_series(series, 0, 1)) == {"s"}
    assert _metrics(substr_series(series, -1)) == {"a", "b", "c"}


def test_render_targets_aggregate_group(series):
    out = evaluate_target(series, "aggregate(s.*, 'min')")
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals[0] == 1.0 and _metrics(out) == {"aggregate"}
    out = evaluate_target(series, "group(s.a, s.b)")
    assert out.count() == 8
    out = evaluate_target(series, "substr(s.*, 1, 2)")
    assert _metrics(out) == {"a", "b", "c"}


def test_moving_registry_and_timeshift_strings(series):
    out = evaluate_target(series, "movingMax(s.a, 2)")
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals == {0: 1.0, 60: 2.0, 120: 3.0, 180: 4.0}
    out = evaluate_target(series, "movingSum(s.a, 2)")
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals[180] == 7.0  # 3 + 4
    out = evaluate_target(series, "movingMin(s.b, 3)")
    assert {r["ts"]: r["value"] for r in out.collect()}[180] == 20.0
    # graphite string intervals: '1min' shows the PAST (data forward)
    out = evaluate_target(series, "timeShift(s.a, '1min')")
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals[60] == 1.0 and vals[240] == 4.0
    out = evaluate_target(series, "timeShift(s.a, '+1min')")
    vals = {r["ts"]: r["value"] for r in out.collect()}
    assert vals[-60] == 1.0
    # raw seconds stay engine-native (positive = future)
    out = evaluate_target(series, "timeShift(s.a, 60)")
    assert {r["ts"]: r["value"] for r in out.collect()}[60] == 1.0


def test_nn_derivative_counter_wrap(spark):
    from graphouse_spark.functions.timeseries import non_negative_derivative

    # 8-bit counter wraps at 255: 250 -> 4 recovers as 255-250+4 = 9 over 60s
    s = _mk(spark, [("c", 0, 100.0), ("c", 60, 250.0), ("c", 120, 4.0)])
    plain = {r["ts"]: r["rate"] for r in non_negative_derivative(s).collect()}
    assert plain[60] == 2.5 and plain[120] is None  # reset -> null
    wrapped = {r["ts"]: r["rate"]
               for r in non_negative_derivative(s, max_value=255.0).collect()}
    # graphite's _nonNegativeDelta: the wrap traverses 255 -> 0, so the
    # recovered delta carries one extra increment (+1)
    assert wrapped[120] == round((255.0 - 250.0 + 4.0 + 1.0) / 60, 6)
    out = evaluate_target(s, "nonNegativeDerivative(c, 255)")
    assert {r["ts"]: r["value"] for r in out.collect()}[120] == wrapped[120]

    # a sample EXCEEDING maxValue is invalid for an 8-bit counter ->
    # None at that point (graphite returns None when latest > maxValue)
    s2 = _mk(spark, [("c", 0, 100.0), ("c", 60, 300.0), ("c", 120, 4.0)])
    over = {r["ts"]: r["rate"]
            for r in non_negative_derivative(s2, max_value=255.0).collect()}
    assert over[60] is None


def test_select_then_filter_matches_composition(series):
    """r14 fusion (guide §2.4): the one-pass
    select_then_filter_series must be row-identical to
    filter_series(select_series_by(...)) — both operators only drop
    whole series, so the outer stat over the selected rows equals the
    stat over the full series. Covers highest/lowest, every operator
    spelling, n beyond the metric count, and an empty result."""
    from graphouse_spark.functions.timeseries import select_then_filter_series

    cases = [
        ("current", 3, "average", ">", 49.0, False),   # the entry query
        ("current", 1, "average", ">", 0.0, False),
        ("average", 2, "current", "<=", 40.0, False),
        ("max", 1, "min", "=", 1.0, True),             # lowest=True
        ("sum", 99, "sum", "!=", 10.0, False),         # n > #metrics
        ("average", 2, "average", "<", -1.0, False),   # empty result
    ]
    for sel_fn, n, flt_fn, op, thr, lowest in cases:
        fused = select_then_filter_series(
            series, sel_fn, n, flt_fn, op, thr, lowest=lowest)
        composed = filter_series(
            select_series_by(series, sel_fn, n, lowest=lowest),
            flt_fn, op, thr)
        assert sorted(map(tuple, fused.collect())) == \
            sorted(map(tuple, composed.collect())), (sel_fn, n, flt_fn, op, thr, lowest)
    with pytest.raises(ValueError, match="unknown operator"):
        select_then_filter_series(series, "average", 1, "average", "~", 1.0).collect()
    with pytest.raises(ValueError, match="unknown series statistic"):
        select_then_filter_series(series, "nope", 1, "average", ">", 1.0).collect()
