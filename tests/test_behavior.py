"""ClickHouse behavioral-function family: windowFunnel / retention /
sequenceMatch semantics pinned on hand-built event streams."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.behavior import (
    retention_cohorts,
    sequence_match,
    window_funnel,
)

SCHEMA = "event_id long, user_id long, event_type string, ts_sec long"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)], SCHEMA
    )


def test_window_funnel_levels(spark):
    rows = [
        # u1: full funnel inside the window
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2: purchase arrives after the window closes -> level 2
        (2, "view", 100), (2, "click", 200), (2, "purchase", 100 + 4000),
        # u3: never clicks -> level 1 (purchase can't count without click)
        (3, "view", 100), (3, "purchase", 150),
        # u4: no view at all -> absent from output
        (4, "click", 100), (4, "purchase", 200),
        # u5: click BEFORE the anchor view doesn't count -> level 1
        (5, "click", 50), (5, "view", 100),
    ]
    out = {r["user_id"]: r["level"]
           for r in window_funnel(_ev(spark, rows), ["view", "click", "purchase"], 3600).collect()}
    assert out == {1: 3, 2: 2, 3: 1, 5: 1}


def test_window_funnel_first_match_anchor(spark):
    # the EARLIEST view anchors: a later view would have allowed the
    # purchase, but first-match semantics stick with t1=100
    rows = [
        (1, "view", 100), (1, "click", 150), (1, "view", 5000),
        (1, "purchase", 5100),
    ]
    out = window_funnel(_ev(spark, rows), ["view", "click", "purchase"], 1000).collect()
    assert out[0]["level"] == 2


def test_retention_cohorts(spark):
    d = 86400
    rows = [
        # cohort day 0: u1 returns day 0 and day 2; u2 returns day 2
        (1, "signup", 10), (1, "view", 20), (1, "view", 2 * d + 5),
        (2, "signup", 30), (2, "view", 2 * d + 6),
        # cohort day 1: u3 returns day 1 (offset 0)
        (3, "signup", d + 10), (3, "view", d + 50),
        # u4 views but never signed up -> no cohort
        (4, "view", 10),
        # offset >= 7 is clipped
        (5, "signup", 10), (5, "view", 8 * d),
    ]
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in retention_cohorts(_ev(spark, rows), "signup", "view", 7).collect()}
    assert out == {(0, 0): 1, (0, 2): 2, (1, 0): 1}


def test_sequence_match_order_and_ties(spark):
    chars = {"view": "v", "click": "c", "purchase": "p"}
    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        (2, "purchase", 100), (2, "view", 200), (2, "click", 300),
        (3, "view", 100), (3, "purchase", 200),
    ]
    out = {r["user_id"]: r["matched"]
           for r in sequence_match(_ev(spark, rows), chars, "v.*c.*p").collect()}
    assert out == {1: True, 2: False, 3: False}
    # same-second ties break by event_id: view(id first) then click
    tied = _ev(spark, [(9, "view", 500), (9, "click", 500)])
    got = sequence_match(tied, chars, "vc").collect()[0]["matched"]
    assert got is True


def test_sequence_match_rejects_multichar_encoding(spark):
    with pytest.raises(ValueError):
        sequence_match(_ev(spark, [(1, "view", 1)]), {"view": "vv"}, "v").collect()


def test_sequence_count_non_overlapping(spark):
    from graphouse_spark.functions.behavior import sequence_count

    chars = {"view": "v", "purchase": "p"}
    rows = [
        # u1: v p v p -> 2 matches of v[^p]*p
        (1, "view", 100), (1, "purchase", 200), (1, "view", 300), (1, "purchase", 400),
        # u2: v v p -> 1 (non-overlapping, leftmost-first)
        (2, "view", 100), (2, "view", 150), (2, "purchase", 200),
        # u3: p v -> 0
        (3, "purchase", 100), (3, "view", 200),
    ]
    out = {r["user_id"]: r["n_matches"]
           for r in sequence_count(_ev(spark, rows), chars, "v[^p]*p").collect()}
    assert out == {1: 2, 2: 1, 3: 0}


def test_sequence_next_node(spark):
    from graphouse_spark.functions.behavior import sequence_next_node

    rows = [
        # u1: view -> click -> purchase: next after chain = purchase
        (1, "view", 10, 1), (1, "click", 20, 2), (1, "purchase", 30, 3),
        # u2: chain completes on the last event -> no row
        (2, "view", 10, 4), (2, "click", 20, 5),
        # u3: click before view only -> chain incomplete -> no row
        (3, "click", 10, 6), (3, "view", 20, 7),
        # u4: same-ts tie: click(id 9) then view(id 8)? order is (ts, id):
        # view@10#8, click@10#9, signup@10#10 -> chain done at pos 1, next = signup
        (4, "view", 10, 8), (4, "click", 10, 9), (4, "signup", 10, 10),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_sec long, event_id long")
    out = {r["user_id"]: r["next_event"]
           for r in sequence_next_node(df, ["view", "click"]).collect()}
    assert out == {1: "purchase", 4: "signup"}


def test_group_array_moving_exact(spark):
    from pyspark.sql import functions as F

    from graphouse_spark.functions.chagg import group_array_moving

    rows = [("u", i, float(i + 1)) for i in range(5)]  # 1..5
    df = spark.createDataFrame(rows, "u string, t long, v double")
    out = {r["t"]: (r["moving_sum"], r["moving_avg_units"])
           for r in group_array_moving(df, ["u"], ["t"], F.col("v"), 3).collect()}
    assert out[0] == (1.0, 1.0)        # head shorter than k stays exact
    assert out[1] == (3.0, 1.5)
    assert out[4] == (12.0, 4.0)       # 3+4+5


def test_funnel_latency(spark):
    from graphouse_spark.functions.behavior import funnel_latency

    rows = [
        # u1 completes A->B->C: anchor 100, last 160 -> latency 60
        (1, 100, "A"), (1, 130, "B"), (1, 160, "C"),
        # u2 stalls at B
        (2, 100, "A"), (2, 150, "B"),
        # u3 completes but C lands outside the window
        (3, 100, "A"), (3, 150, "B"), (3, 100 + 4000, "C"),
        # u4 completes with a later, faster retry ignored (first-match)
        (4, 0, "A"), (4, 10, "B"), (4, 50, "C"), (4, 60, "C"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_sec long, event_type string")
    out = {r["user_id"]: r["latency_sec"]
           for r in funnel_latency(ev, ["A", "B", "C"], 3600).collect()}
    assert out == {1: 60, 4: 50}
    with pytest.raises(ValueError, match="at least two"):
        funnel_latency(ev, ["A"], 3600)
