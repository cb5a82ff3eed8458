"""as-of join operator: backward/forward, ties, tolerance, no-match."""

import pytest

from graphouse_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("a", 10, "l1"), ("a", 20, "l2"), ("a", 5, "l0"), ("b", 10, "l3")],
        "k string, t long, tag string",
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 10, 2.0), ("a", 15, 3.0), ("c", 1, 9.0)],
        "k string, t long, v double",
    )
    return left, right


def rows(df):
    return {(r["k"], r["t"]): r["v"] for r in df.collect()}


def test_backward_with_tie_and_no_match(spark, frames):
    left, right = frames
    out = rows(asof_join(left, right, "k", "t", "t", ["v"]))
    assert out[("a", 10)] == 2.0   # tie: right row at equal t matches (<=)
    assert out[("a", 20)] == 3.0   # latest among 8,10,15
    assert out[("a", 5)] is None   # nothing at or before 5
    assert out[("b", 10)] is None  # key absent on the right


def test_forward(spark, frames):
    left, right = frames
    out = rows(asof_join(left, right, "k", "t", "t", ["v"], direction="forward"))
    assert out[("a", 5)] == 1.0    # earliest at-or-after 5 is t=8
    assert out[("a", 10)] == 2.0   # tie again
    assert out[("a", 20)] is None  # nothing after 20


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = rows(asof_join(left, right, "k", "t", "t", ["v"], tolerance=4))
    assert out[("a", 10)] == 2.0   # gap 0 <= 4
    assert out[("a", 20)] is None  # nearest is t=15, gap 5 > 4


def test_left_columns_preserved_and_invalid_direction(spark, frames):
    left, right = frames
    out = asof_join(left, right, "k", "t", "t", ["v"])
    assert out.columns == ["k", "t", "tag", "v"]
    assert out.count() == left.count()  # left join: every left row survives
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "t", "t", ["v"], direction="nearest")
