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


# ------------------------------------------------- graphite percentiles


def test_graphite_rank_percentile_hand_math(spark):
    """_getPercentile parity: [1..4], p50 -> rank ceil(0.5*5)=3 -> 3.0;
    interpolated -> rank 2 frac 0.5 -> 2 + 0.5*(3-2) = 2.5."""
    from graphouse_spark.functions.timeseries import percentile_of_series

    rows = [(f"s.{i}", 0, float(i)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = percentile_of_series(df, 0.5).collect()[0]["pct_value"]
    assert got == 3.0
    interp = percentile_of_series(df, 0.5, interpolate=True).collect()[0]["pct_value"]
    assert interp == 2.5
    # p100 clamps to the last element in both modes
    assert percentile_of_series(df, 1.0).collect()[0]["pct_value"] == 4.0
    assert percentile_of_series(
        df, 1.0, interpolate=True).collect()[0]["pct_value"] == 4.0


def test_n_percentile_rank_convention(spark, series):
    from graphouse_spark.functions.timeseries import n_percentile

    # s.a = [1,2,3,4]: p90 -> rank ceil(0.9*5)=5 clamped to 4 -> 4.0
    got = {(r["metric"], r["ts"]): r["pctl_value"]
           for r in n_percentile(series, 0.9).collect()}
    assert got[("s.a", 1000)] == 4.0
    assert len(got) == 12  # full grid preserved


# ------------------------------------------------- summarize alignToFrom


def test_summarize_align_to_from(spark):
    from graphouse_spark.functions.timeseries import summarize

    rows = [("s.a", 30, 1.0), ("s.a", 90, 2.0), ("s.a", 150, 4.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    epoch = {r["ts"]: r["value"] for r in summarize(df, 120, "sum").collect()}
    assert epoch == {0: 3.0, 120: 4.0}  # epoch-aligned buckets
    anchored = {r["ts"]: r["value"]
                for r in summarize(df, 120, "sum", align_to_from=True).collect()}
    assert anchored == {30: 3.0, 150: 4.0}  # buckets start at series min ts


def test_summarize_registry_align_and_alias(spark, series):
    got = _by(evaluate_target(series, "summarize(s.a, '2min', 'total', true)"))
    # s.a starts at 1000: buckets [1000,1120) -> 1+2=3, [1120,1240) -> 3+4=7
    assert got[("s.a", 1000)] == 3.0 and got[("s.a", 1120)] == 7.0


# ------------------------------------------------- xFilesFactor gates


def test_moving_average_xff(spark):
    from graphouse_spark.functions.timeseries import moving_average

    rows = [("s.a", 0, 1.0), ("s.a", 60, None), ("s.a", 120, None),
            ("s.a", 180, 4.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    # window of 3: at ts=120 only 1/3 non-null -> nulled at xff=0.5
    got = {r["ts"]: r["moving_avg"]
           for r in moving_average(df, 3, x_files_factor=0.5).collect()}
    assert got[120] is None
    assert got[0] == 1.0  # 1/1 non-null clears the factor
    ungated = {r["ts"]: r["moving_avg"] for r in moving_average(df, 3).collect()}
    assert ungated[120] == 1.0


def test_moving_window_registry_xff(spark, series):
    with_gap = series.withColumn(
        "value", F.when(F.col("ts").isin(1060, 1120), None)
        .otherwise(F.col("value")))
    got = _by(evaluate_target(with_gap, "movingWindow(s.a, 3, 'sum', 0.5)"))
    assert got[("s.a", 1120)] is None  # 1/3 valid < 0.5


def test_stdev_tolerance_and_null_count(spark):
    from graphouse_spark.functions.timeseries import moving_stddev

    rows = [("s.a", 0, 2.0), ("s.a", 60, None), ("s.a", 120, 4.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r["mov_stddev"]
           for r in moving_stddev(df, 3, window_tolerance=0.1).collect()}
    # ts=120 window = [2, None, 4]: stddev over the 2 valid points
    # (pop stddev of [2,4] = 1.0) — None must NOT inflate the divisor
    assert got[120] == 1.0
    strict = {r["ts"]: r["mov_stddev"]
              for r in moving_stddev(df, 3, window_tolerance=0.9).collect()}
    assert strict[120] is None  # 2/3 valid < 0.9


# ------------------------------------------------- transformNull reference


def test_transform_null_reference_series(spark):
    from graphouse_spark.functions.timeseries import transform_null

    s = spark.createDataFrame(
        [("s.a", 0, None), ("s.a", 60, None), ("s.a", 120, 3.0)],
        "metric string, ts long, value double")
    ref = spark.createDataFrame(
        [("r", 0, 9.0), ("r", 60, None), ("r", 120, 9.0)],
        "metric string, ts long, value double")
    got = {r["ts"]: r["value"] for r in transform_null(s, -1.0, ref).collect()}
    assert got[0] == -1.0      # ref has a value here -> filled
    assert got[60] is None     # ref null here -> stays null
    assert got[120] == 3.0     # non-null passes through


def test_transform_null_registry_reference(spark, series):
    with_gap = series.withColumn(
        "value", F.when((F.col("metric") == "s.a") & (F.col("ts") == 1060),
                        None).otherwise(F.col("value")))
    got = _by(evaluate_target(with_gap, "transformNull(s.a, -1, s.b)"))
    assert got[("s.a", 1060)] == -1.0


# ------------------------------------------------- sortByName natural


def test_sort_by_name_natural_and_reverse(spark):
    from graphouse_spark.functions.timeseries import sort_by_name

    rows = [(m, 0, 1.0) for m in ("srv10.cpu", "srv2.cpu", "srv1.cpu")]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    lex = [r["metric"] for r in sort_by_name(df).select(
        "metric", "rank").distinct().orderBy("rank").collect()]
    assert lex == ["srv1.cpu", "srv10.cpu", "srv2.cpu"]
    nat = [r["metric"] for r in sort_by_name(df, natural=True).select(
        "metric", "rank").distinct().orderBy("rank").collect()]
    assert nat == ["srv1.cpu", "srv2.cpu", "srv10.cpu"]
    rev = [r["metric"] for r in sort_by_name(df, natural=True, reverse=True)
           .select("metric", "rank").distinct().orderBy("rank").collect()]
    assert rev == ["srv10.cpu", "srv2.cpu", "srv1.cpu"]


# ------------------------------------------------- holtWinters names


def test_holt_winters_registry_names(spark, series):
    got = evaluate_target(series, "holtWintersForecast(s.a)")
    assert _metrics(got) == {"holtWintersForecast(s.a)"}
    bands = evaluate_target(series, "holtWintersConfidenceBands(s.a)")
    assert _metrics(bands) == {
        "holtWintersConfidenceUpper(s.a)", "holtWintersConfidenceLower(s.a)"}


# ------------------------------------------------- verticalLine


def test_vertical_line(spark, series):
    got = evaluate_target(series, "verticalLine(1060, 'deploy')").collect()
    assert len(got) == 2  # graphite's two-point marker
    assert {(r["metric"], r["ts"], r["value"]) for r in got} == {
        ("deploy", 1060, 1.0)}
    with pytest.raises(ValueError, match="eventStart"):
        evaluate_target(series, "verticalLine(99, 'too-early')").collect()


# ------------------------------------------------- smartSummarize


def test_smart_summarize_graphite_signature(spark, series):
    """graphite form smartSummarize(s, '2min', 'sum') — func in the
    THIRD position (the old registry demanded an anchor int there)."""
    got = _by(evaluate_target(series, "smartSummarize(s.a, '2min', 'sum')",
                              start=1000))
    # anchored at the window start 1000: [1000,1120) -> 3, [1120,1240) -> 7
    assert got[("s.a", 1000)] == 3.0 and got[("s.a", 1120)] == 7.0


def test_smart_summarize_align_to(spark, series):
    from graphouse_spark.functions.target import _smart_anchor

    # 1000s into the epoch day, aligned to hours -> anchor 0
    assert _smart_anchor(1000, "hours") == 0
    assert _smart_anchor(7400, "'1hour'") == 7200
    assert _smart_anchor(7400, "minutes") == 7380
    assert _smart_anchor(None, "days") == 0
    with pytest.raises(ValueError, match="alignTo"):
        _smart_anchor(1000, "fortnights")


# ------------------------------------------------- aggregate xff


def test_aggregate_xff(spark):
    from graphouse_spark.functions.timeseries import aggregate_series

    rows = [("s.a", 0, 1.0), ("s.b", 0, 2.0), ("s.c", 0, 3.0),
            ("s.a", 60, 1.0), ("s.b", 60, None), ("s.c", 60, None)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r["value"]
           for r in aggregate_series(df, "sum", x_files_factor=0.5).collect()}
    assert got[0] == 6.0
    assert got[60] is None  # 1/3 of the selection's series < 0.5
    ungated = {r["ts"]: r["value"] for r in aggregate_series(df, "sum").collect()}
    assert ungated[60] == 1.0


def test_aggregate_registry_xff(spark, series):
    with_gap = series.withColumn(
        "value", F.when((F.col("ts") == 1060) & (F.col("metric") != "s.a"),
                        None).otherwise(F.col("value")))
    got = _by(evaluate_target(with_gap, "aggregate(s.*, 'sum', 0.5)"))
    assert got[("aggregate", 1060)] is None
    assert got[("aggregate", 1000)] == 111.0


# ------------------------------------------------- aggregateLine


def test_aggregate_line_registry_shape(spark, series):
    got = evaluate_target(series, "aggregateLine(s.a, 'avg')").collect()
    # 3-point flat guide line named aggregateLine(name, value)
    assert {r["metric"] for r in got} == {"aggregateLine(s.a, 2.5)"}
    assert sorted(r["ts"] for r in got) == [1000, 1090, 1180]
    assert all(r["value"] == 2.5 for r in got)
    kept = evaluate_target(series, "aggregateLine(s.a, 'avg', true)").collect()
    assert sorted(r["ts"] for r in kept) == [1000, 1060, 1120, 1180]


# ------------------------------------------------- cactiStyle si/units


def test_cacti_style_system_and_units(spark):
    from graphouse_spark.functions.timeseries import cacti_style

    df = spark.createDataFrame(
        [("s.a", 0, 1500.0), ("s.a", 60, 2500000.0)],
        "metric string, ts long, value double")
    plain = {r["metric"] for r in cacti_style(df).collect()}
    assert plain == {"s.a Current:2500000.00 Max:2500000.00 Min:1500.00"}
    si = {r["metric"] for r in cacti_style(df, system="si").collect()}
    assert si == {"s.a Current:2.50M Max:2.50M Min:1.50k"}
    u = {r["metric"] for r in cacti_style(df, system="si", units="b").collect()}
    assert u == {"s.a Current:2.50Mb Max:2.50Mb Min:1.50kb"}


# ------------------------------------------------- timeShift extra args


def test_time_shift_accepts_reset_end_flag(spark, series):
    got = _by(evaluate_target(series, "timeShift(s.a, '-1min', false)"))
    assert ("s.a", 1060) in got  # arity accepted; shift applied


# ------------------------------------------------- linearRegression fit


def test_linear_regression_fit_window(spark):
    from graphouse_spark.functions.timeseries import linear_regression_line

    # slope 1 on [0, 180], then an outlier at 240
    rows = [("s.a", t, float(t) / 60) for t in (0, 60, 120, 180)]
    rows.append(("s.a", 240, 100.0))
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    fit = {r["ts"]: r["value"]
           for r in linear_regression_line(df, fit_end=180).collect()}
    # fit over the clean range projects slope 1/60 across ALL ts
    assert fit[240] == pytest.approx(4.0, abs=1e-6)
    assert len(fit) == 5
    full = {r["ts"]: r["value"]
            for r in linear_regression_line(df).collect()}
    assert full[240] > 10  # outlier drags the unrestricted fit


# ------------------------------------------------- pctl property test


def _get_percentile_py(points, percentile, interpolate=False):
    """Pure-python transcription of graphite-web's _getPercentile
    (render/functions.py) — the reference the Catalyst expression in
    timeseries._graphite_pctl must reproduce element-for-element."""
    import math

    points = sorted(p for p in points if p is not None)
    if not points:
        return None
    fractional_rank = (percentile / 100.0) * (len(points) + 1)
    rank = int(fractional_rank)
    rank_fraction = fractional_rank - rank
    if not interpolate:
        rank += int(math.ceil(rank_fraction))
    if rank == 0:
        result = points[0]
    elif rank - 1 == len(points):
        result = points[-1]
    else:
        result = points[rank - 1]
    if interpolate and rank != len(points):
        next_value = points[min(rank, len(points) - 1)]
        result = result + rank_fraction * (next_value - result)
    return result


def test_graphite_pctl_property(spark):
    """_graphite_pctl == graphite's _getPercentile over a sweep of
    array sizes, percentiles and both modes (one Spark job for the
    whole matrix: every case is a row)."""
    from graphouse_spark.functions.timeseries import _graphite_pctl

    import random

    rng = random.Random(9)
    cases = []
    cid = 0
    for n in (1, 2, 3, 4, 5, 7, 10, 23):
        for p in (0.0, 1.0, 5.0, 20.0, 50.0, 80.0, 95.0, 99.0, 100.0):
            vals = [round(rng.uniform(-50, 50), 2) for _ in range(n)]
            if n > 2:
                vals[rng.randrange(n)] = None  # nulls must be skipped
            cases.append((cid, vals, p))
            cid += 1
    rows = [(i, [v for v in vs]) for i, vs, _ in cases]
    df = spark.createDataFrame(rows, "cid int, vals array<double>")
    arr = F.sort_array(F.filter("vals", lambda v: v.isNotNull()))
    sel = [F.col("cid")]
    for i, _, p in cases:
        sel.append(F.when(F.col("cid") == i, _graphite_pctl(arr, p / 100.0))
                   .alias(f"r{i}"))
        sel.append(F.when(F.col("cid") == i,
                          _graphite_pctl(arr, p / 100.0, interpolate=True))
                   .alias(f"ri{i}"))
    got = {r["cid"]: r for r in df.select(*sel).collect()}
    for i, vals, p in cases:
        exp = _get_percentile_py(vals, p)
        exp_i = _get_percentile_py(vals, p, interpolate=True)
        assert got[i][f"r{i}"] == pytest.approx(exp, abs=1e-9), (i, vals, p)
        assert got[i][f"ri{i}"] == pytest.approx(exp_i, abs=1e-9), (i, vals, p)


# ------------------------------------------------- aliasSub backrefs


def test_alias_sub_python_backrefs(spark, series):
    """graphite aliasSub replacements use python \\1 group refs (Spark
    speaks Java $1) — dashboard targets must substitute, and a literal
    $ must stay literal."""
    from graphouse_spark.functions.timeseries import alias_sub

    got = _metrics(evaluate_target(series, r"aliasSub(s.*, 's\.(\w)', 'got-\1')"))
    assert got == {"got-a", "got-b", "got-c"}
    lit = _metrics(alias_sub(series, r"^s\.", "cost$."))
    assert lit == {"cost$.a", "cost$.b", "cost$.c"}


def test_legend_value_si_system(spark):
    from graphouse_spark.functions.timeseries import legend_value

    df = spark.createDataFrame(
        [("s.a", 0, 1500.0), ("s.a", 60, 2500.0)],
        "metric string, ts long, value double")
    got = {r["metric"] for r in legend_value(df, "max", "si").collect()}
    assert got == {"s.a (max: 2.50k)"}
    plain = {r["metric"] for r in legend_value(df, "max").collect()}
    assert plain == {"s.a (max: 2500.00)"}


def test_integral_by_interval_window_anchor(spark):
    """graphite counts integralByInterval intervals from the REQUEST
    start — a window starting at 1000 resets its 2-minute integral at
    1000/1120, not at the epoch-aligned 960/1080."""
    from graphouse_spark.functions.timeseries import integral_by_interval

    rows = [("s.a", 1000 + i * 60, 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    anchored = {r["ts"]: r["running_value"]
                for r in integral_by_interval(df, 120, 1000).collect()}
    assert anchored == {1000: 1.0, 1060: 2.0, 1120: 1.0, 1180: 2.0}
    # epoch alignment puts 1030 alone in [960,1080), 1090+1150 in
    # [1080,1200), 1210 alone — the 1030-anchored buckets differ
    rows2 = [("s.a", 1030 + i * 60, 1.0) for i in range(4)]
    df2 = spark.createDataFrame(rows2, "metric string, ts long, value double")
    ep2 = {r["ts"]: r["running_value"]
           for r in integral_by_interval(df2, 120).collect()}
    an2 = {r["ts"]: r["running_value"]
           for r in integral_by_interval(df2, 120, 1030).collect()}
    assert ep2 == {1030: 1.0, 1090: 1.0, 1150: 2.0, 1210: 1.0}
    assert an2 == {1030: 1.0, 1090: 2.0, 1150: 1.0, 1210: 2.0}
    got = evaluate_target(df, "integralByInterval(s.a, '2min')", start=1000)
    by = {r["ts"]: r["value"] for r in got.collect()}
    assert by == {1000: 1.0, 1060: 2.0, 1120: 1.0, 1180: 2.0}


# ------------------------------------------------- round-7 advisory fixes


def test_smart_anchor_week_truncates_to_sunday():
    """graphite truncates weeks to SUNDAY (attime isoweekday() % 7),
    not python's Monday. Epoch day 3 (1970-01-04) is a Sunday."""
    from graphouse_spark.functions.target import _smart_anchor

    sunday = 3 * 86400
    assert _smart_anchor(sunday + 3600, "weeks") == sunday      # Sunday stays
    assert _smart_anchor(sunday + 86400, "weeks") == sunday     # Monday -> back 1d
    assert _smart_anchor(sunday + 6 * 86400 + 50, "weeks") == sunday  # Saturday -> back 6d
    assert _smart_anchor(sunday + 7 * 86400, "weeks") == sunday + 7 * 86400


def test_summarize_align_to_from_window_anchor(spark, series):
    """alignToFrom anchors at the RENDER-WINDOW start when known
    (graphite requestContext.startTime), per-series min only as the
    windowless fallback."""
    from graphouse_spark.functions.timeseries import summarize

    rows = [("s.a", 30, 1.0), ("s.a", 90, 2.0), ("s.a", 150, 4.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    anchored = {r["ts"]: r["value"]
                for r in summarize(df, 120, "sum", align_to_from=True,
                                   anchor_seconds=0).collect()}
    assert anchored == {0: 3.0, 120: 4.0}
    # through the evaluator with an explicit window start
    got = _by(evaluate_target(series, "summarize(s.a, '2min', 'total', true)",
                              start=980))
    # buckets [980,1100) -> 1+2=3, [1100,1220) -> 3+4=7
    assert got[("s.a", 980)] == 3.0 and got[("s.a", 1100)] == 7.0


def test_alias_sub_backslash_escapes(spark, series):
    """python-template escapes translate, bad escapes raise like
    re.sub instead of leaking into Java's replacement parser."""
    import pytest

    from graphouse_spark.functions.timeseries import (
        _java_replacement, alias_sub)

    # literal backslash survives as one backslash in the output name
    got = _metrics(alias_sub(series, r"^s\.(\w)$", "s\\\\\\1"))
    assert got == {"s\\a", "s\\b", "s\\c"}
    # \g<n> named-number form
    assert _java_replacement(r"x\g<2>y") == "x$2y"
    # recognized char escapes become the character itself
    assert _java_replacement(r"a\tb") == "a\tb"
    with pytest.raises(ValueError, match="bad escape"):
        _java_replacement("dangling\\")
    with pytest.raises(ValueError, match="bad escape"):
        _java_replacement(r"\q")
