"""Tree search over the metrics DataFrame — ports of MetricTreeTest search/status cases."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.autohide import autohide_updates
from graphouse_spark.operators.dedup import latest_status
from graphouse_spark.operators.tree import glob_search, modify_status, resolved_tree, visible_tree
from graphouse_spark.paths import get_level, get_parent_name
from graphouse_spark.schemas import METRICS_SCHEMA

T0 = dt.datetime(2018, 11, 14, 12, 0, 0)


def tick(i):
    return T0 + dt.timedelta(seconds=i)


def tree_rows(names, status="SIMPLE", t=0):
    """Expand names to rows incl. all ancestor dirs (reference writes the full chain)."""
    seen = {}
    for name in names:
        chain = []
        cur = name
        while cur:
            chain.append(cur)
            cur = get_parent_name(cur)
        for node in chain:
            seen.setdefault(node, (node, get_level(node), get_parent_name(node), status, tick(t)))
    return list(seen.values())


def make_metrics(spark, rows):
    return spark.createDataFrame(rows, METRICS_SCHEMA)


@pytest.fixture()
def base_tree(spark):
    return make_metrics(
        spark,
        tree_rows(["five_sec.int_8742.x1", "five_sec.int_8743.x1", "five_sec.int_8742.x2"]),
    )


def names(df):
    return [r["name"] for r in df.collect()]


def test_search_glob(spark, base_tree):
    # MetricTreeTest.testSearch
    assert names(glob_search(base_tree, "five_sec.int_874?.x1")) == [
        "five_sec.int_8742.x1",
        "five_sec.int_8743.x1",
    ]
    assert names(glob_search(base_tree, "five_sec.int_8742.x*")) == [
        "five_sec.int_8742.x1",
        "five_sec.int_8742.x2",
    ]
    assert names(glob_search(base_tree, "*")) == ["five_sec."]
    assert names(glob_search(base_tree, "five_sec.*")) == ["five_sec.int_8742.", "five_sec.int_8743."]


def test_invalid_glob_empty(spark, base_tree):
    assert names(glob_search(base_tree, "asdf[")) == []


def test_ban_prunes_subtree(spark, base_tree):
    # BAN on a dir removes it and its metrics from search
    banned = base_tree.unionByName(
        make_metrics(spark, [("five_sec.int_8743.", 2, "five_sec.", "BAN", tick(10))])
    )
    assert names(glob_search(banned, "five_sec.*")) == ["five_sec.int_8742."]
    assert names(glob_search(banned, "five_sec.int_8743.*")) == []
    assert names(glob_search(banned, "five_sec.int_8743.x1")) == []


def test_approve_reopens(spark, base_tree):
    updated = base_tree.unionByName(
        make_metrics(
            spark,
            [
                ("five_sec.int_8743.", 2, "five_sec.", "BAN", tick(10)),
                ("five_sec.int_8743.", 2, "five_sec.", "APPROVED", tick(20)),
            ],
        )
    )
    assert names(glob_search(updated, "five_sec.*")) == ["five_sec.int_8742.", "five_sec.int_8743."]


def test_latest_status_order_independent(spark, base_tree):
    # MetricTreeTest.testStatusesLoad analog: max(updated) wins regardless of row order
    shuffled = base_tree.unionByName(
        make_metrics(
            spark,
            [
                ("five_sec.int_8742.x1", 3, "five_sec.int_8742.", "HIDDEN", tick(30)),
                ("five_sec.int_8742.x1", 3, "five_sec.int_8742.", "APPROVED", tick(15)),
            ],
        )
    ).orderBy(F.rand(seed=7))
    row = latest_status(shuffled).filter(F.col("name") == "five_sec.int_8742.x1").collect()[0]
    assert row["status"] == "HIDDEN"


def test_modify_status_lattice(spark, base_tree):
    banned = base_tree.unionByName(
        make_metrics(spark, [("five_sec.int_8743.", 2, "five_sec.", "BAN", tick(10))])
    )
    # BAN -> SIMPLE denied: no rows to append
    assert modify_status(banned, "five_sec.int_8743.", "SIMPLE", tick(20)).count() == 0
    # BAN -> APPROVED allowed
    upd = modify_status(banned, "five_sec.int_8743.", "APPROVED", tick(20))
    assert [(r["name"], r["status"]) for r in upd.collect()] == [("five_sec.int_8743.", "APPROVED")]


def test_autohide(spark, base_tree):
    from tests.test_read_path import make_data

    now = 1_542_199_500
    data = make_data(
        spark,
        # x1: plenty of points, recent -> kept
        [("five_sec.int_8742.x1", 1.0, now - i, now - i) for i in range(300)]
        # x2: sparse and stale -> auto-hidden
        + [("five_sec.int_8742.x2", 1.0, now - 40 * 86400, now - 40 * 86400)],
    )
    upd = autohide_updates(data, base_tree, max_values_count=200, retention_days=7, now_seconds=now)
    assert [(r["name"], r["status"]) for r in upd.collect()] == [("five_sec.int_8742.x2", "AUTO_HIDDEN")]
    # and a BANned metric is not flipped
    banned = base_tree.unionByName(
        make_metrics(spark, [("five_sec.int_8742.x2", 3, "five_sec.int_8742.", "BAN", tick(50))])
    )
    assert autohide_updates(data, banned, 200, 7, now).count() == 0


def test_incremental_scan(spark):
    import datetime as dt
    from graphouse_spark.operators.tree import incremental_scan
    from graphouse_spark.schemas import METRICS_SCHEMA
    t0 = dt.datetime(2018, 11, 14, 12, 0, 0)
    rows = [
        ("a.b.c", 3, "a.b.", "SIMPLE", t0),
        ("a.b.c", 3, "a.b.", "HIDDEN", t0 + dt.timedelta(seconds=30)),
        ("a.b.d", 3, "a.b.", "SIMPLE", t0 - dt.timedelta(seconds=60)),
    ]
    m = spark.createDataFrame(rows, METRICS_SCHEMA)
    got = incremental_scan(m, t0).collect()
    assert {(r["name"], r["status"]) for r in got} == {("a.b.c", "HIDDEN")}
