"""Truncated-EMA weights: hand-checked against the rational closed form."""

from fractions import Fraction

from pyspark.sql import functions as F

from graphouse_spark.functions.timeseries import exponential_moving_average, offset_to_zero


def test_ema_matches_hand_rational_math(spark):
    rows = [("m", t, float(v)) for t, v in zip(range(5), [10, 20, 30, 40, 50])]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r["ema"] for r in exponential_moving_average(df, window_points=3).collect()}

    # c = 2/(N+1) = 1/2; weights for m in-frame points: (1/2)^(m-1-j)... reduced 1/2
    omc = Fraction(1, 2)
    vals = [10, 20, 30, 40, 50]
    for t in range(5):
        frame = vals[max(0, t - 2): t + 1]
        m = len(frame)
        wts = [omc ** (m - 1 - j) for j in range(m)]
        expect = float(sum(Fraction(v) * w for v, w in zip(frame, wts)) / sum(wts))
        assert abs(got[t] - round(expect, 6)) < 1e-9, (t, got[t], expect)


def test_offset_to_zero_min_is_zero(spark):
    rows = [("a", 0, 5.0), ("a", 1, 7.0), ("b", 0, -2.0), ("b", 1, 3.0)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    out = {(r["metric"], r["ts"]): r["value"] for r in offset_to_zero(df).collect()}
    assert out == {("a", 0): 0.0, ("a", 1): 2.0, ("b", 0): 0.0, ("b", 1): 5.0}
