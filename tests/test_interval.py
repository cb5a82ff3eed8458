"""interval join: window edges, bucket boundaries, negative times."""

import pytest

from graphouse_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame([("a", 100), ("a", 250), ("b", 100)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 40, 1.0), ("a", 100, 2.0), ("a", 160, 3.0), ("a", 400, 4.0), ("b", 350, 5.0)],
        "k string, t long, v double",
    )
    return left, right


def matches(df):
    out = {}
    for r in df.collect():
        out.setdefault((r["k"], r["t"]), set()).add(r["v"])
    return out


def test_symmetric_window_inclusive_edges(spark, frames):
    left, right = frames
    out = matches(interval_join(left, right, "k", "t", "t", before=60, after=60))
    assert out[("a", 100)] == {1.0, 2.0, 3.0}  # 40 and 160 sit exactly on the edge
    assert ("a", 250) not in out               # [190,310] is empty for key a
    assert ("b", 100) not in out               # b's only right row is 250 away

    wide = matches(interval_join(left, right, "k", "t", "t", before=150, after=150))
    assert wide[("a", 250)] == {2.0, 3.0, 4.0}  # edges 100 and 400 inclusive


def test_asymmetric_window(spark, frames):
    left, right = frames
    out = matches(interval_join(left, right, "k", "t", "t", before=0, after=150))
    assert out[("a", 250)] == {4.0}            # forward-only: 400 matches, 160 behind
    assert out[("a", 100)] == {2.0, 3.0}


def test_negative_timestamps_bucket_correctly(spark):
    left = spark.createDataFrame([("a", -10)], "k string, t long")
    right = spark.createDataFrame([("a", -40, 1.0), ("a", 20, 2.0), ("a", -200, 3.0)],
                                  "k string, t long, v double")
    out = matches(interval_join(left, right, "k", "t", "t", before=50, after=50))
    assert out[("a", -10)] == {1.0, 2.0}


def test_validation(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        interval_join(left, right, "k", "t", "t", before=0, after=0)
