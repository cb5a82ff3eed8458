"""Graphite round-5 transforms: hitcount, smartSummarize, mostDeviant,
maximumAbove/minimumBelow, delay, timeSlice, pow family, timeStack."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.timeseries import (
    delay_series,
    hitcount,
    maximum_above,
    minimum_below,
    most_deviant,
    pow_family,
    smart_summarize,
    time_slice,
    time_stack,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def test_hitcount_integrates_rate(spark):
    # 2 points at 10/s and 20/s with a 60 s native step -> 1800 hits
    s = _mk(spark, [("m", 0, 10.0), ("m", 60, 20.0)])
    got = hitcount(s, 3600, 60).collect()
    assert [(r["metric"], r["ts"], r["hits"]) for r in got] == [("m", 0, 1800.0)]


def test_smart_summarize_anchor_alignment(spark):
    # anchor 100, interval 50: ts 99 -> bucket 50, ts 100 -> 100, ts 149 -> 100
    s = _mk(spark, [("m", 99, 1.0), ("m", 100, 3.0), ("m", 149, 5.0)])
    got = {r["ts"]: r["value"]
           for r in smart_summarize(s, 50, 100, "avg").collect()}
    assert got == {50: 1.0, 100: 4.0}


def test_most_deviant_ranks_by_stddev(spark):
    s = _mk(spark, [
        ("flat", 0, 5.0), ("flat", 60, 5.0),
        ("wild", 0, 0.0), ("wild", 60, 100.0),
        ("mild", 0, 4.0), ("mild", 60, 6.0),
    ])
    got = most_deviant(s, 2).collect()
    ranks = {r["metric"]: r["rank"] for r in got}
    assert ranks == {"wild": 1, "mild": 2}
    assert len(got) == 4  # full point sets of the two winners


def test_maximum_above_minimum_below(spark):
    s = _mk(spark, [("a", 0, 1.0), ("a", 60, 9.0), ("b", 0, 4.0), ("b", 60, 5.0)])
    assert {r["metric"] for r in maximum_above(s, 8.0).collect()} == {"a"}
    assert {r["metric"] for r in minimum_below(s, 2.0).collect()} == {"a"}


def test_delay_and_time_slice(spark):
    s = _mk(spark, [("m", 0, 1.0), ("m", 60, 2.0), ("m", 120, 3.0)])
    d = {r["ts"]: r["value"] for r in delay_series(s, 1).collect()}
    assert d == {0: None, 60: 1.0, 120: 2.0}
    t = {r["ts"]: r["value"] for r in time_slice(s, 60, 120).collect()}
    assert t == {0: None, 60: 2.0, 120: None}  # grid kept, values nulled


def test_pow_family_values(spark):
    s = _mk(spark, [("m", 0, 4.0), ("m", 60, 0.0), ("m", 120, -9.0)])
    got = {r["ts"]: (r["squared"], r["root"], r["inverted"])
           for r in pow_family(s).collect()}
    assert got[0] == (16.0, 2.0, 0.25)
    assert got[60] == (0.0, 0.0, None)  # invert(0) -> null like graphite
    assert got[120] == (81.0, None, pytest.approx(-1 / 9, abs=1e-6))  # sqrt(<0) -> null


def test_time_stack_shifted_copies(spark):
    s = _mk(spark, [("m", 100, 7.0)])
    got = sorted((r["shift_idx"], r["ts"]) for r in time_stack(s, 50, 3).collect())
    assert got == [(0, 100), (1, 150), (2, 200)]


def test_hitcount_prorates_straddling_points(spark):
    """graphite parity: a native interval straddling a bucket edge
    splits its integral across the buckets by seconds of overlap."""
    # step 60, buckets of 50: point at ts=40 covers [40,100) ->
    # 10 s into bucket [0,50), 50 s into [50,100)
    s = _mk(spark, [("m", 40, 1.0)])
    got = {r["ts"]: r["hits"] for r in hitcount(s, 50, 60).collect()}
    assert got == {0: 10.0, 50: 50.0}


def test_hitcount_anchored_buckets(spark):
    """Buckets originate at the request start (graphite's default
    alignToInterval=False), not the epoch."""
    s = _mk(spark, [("m", 30, 2.0), ("m", 90, 4.0)])
    # anchor 30, interval 60: buckets [30,90) and [90,150)
    got = {r["ts"]: r["hits"]
           for r in hitcount(s, 60, 60, anchor_seconds=30).collect()}
    assert got == {30: 120.0, 90: 240.0}


def test_hitcount_window_through_target(spark):
    from graphouse_spark.functions.target import evaluate_target

    s = _mk(spark, [("m", 30, 2.0), ("m", 90, 4.0)])
    got = {r["ts"]: r["value"]
           for r in evaluate_target(s, "hitcount(m, 60, false, 60)",
                                    start=30, end=150).collect()}
    assert got == {30: 120.0, 90: 240.0}
    # alignToInterval=true rounds the anchor down to the interval
    got = {r["ts"]: r["value"]
           for r in evaluate_target(s, "hitcount(m, 60, true, 60)",
                                    start=30, end=150).collect()}
    assert got == {0: 60.0, 60: 180.0, 120: 120.0}


def test_hitcount_infers_native_step(spark):
    """step=None derives each series' native step from its modal ts
    delta — hitcount over 300s input must integrate value*300 per
    point, not value*60 (the round-4 advisory)."""
    rows = [("m", i * 300, 1.0) for i in range(12)]  # one hour at 300s
    s = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r["hits"] for r in hitcount(s, 3600).collect()}
    assert got[0] == 3600.0  # 12 points x 1.0/s x 300 s


def test_hitcount_inference_is_per_series(spark):
    rows = ([("fine", i * 60, 1.0) for i in range(60)]
            + [("coarse", i * 300, 1.0) for i in range(12)])
    s = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {(r["metric"], r["ts"]): r["hits"]
           for r in hitcount(s, 3600).collect()}
    assert got[("fine", 0)] == 3600.0
    assert got[("coarse", 0)] == 3600.0


def test_hitcount_single_point_defaults_60(spark):
    s = spark.createDataFrame([("m", 0, 2.0)],
                              "metric string, ts long, value double")
    got = {r["ts"]: r["hits"] for r in hitcount(s, 3600).collect()}
    assert got[0] == 120.0
