"""Rollup compaction (A7): aged partitions collapse to tier precision;
query results are invariant under compaction (the reference's core
GraphiteMergeTree property)."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.rollup import compact_data_table, rollup_partition
from graphouse_spark.plans.metricdata import MetricDataService
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import CombinedRetentionProvider, MetricRetention, MetricRetentionConfig
from graphouse_spark.sources.tables import read_data, write_data
from tests.test_read_path import make_data

# retention: fresh = 60 s buckets, after 1 day = 300 s buckets (avg);
# sum-family pattern for *.count
PROVIDER = CombinedRetentionProvider([
    MetricRetentionConfig(".*\\.count$", False, MetricRetention("sum", {0: 60, 86400: 300})),
    MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60, 86400: 300})),
])

BASE = 1_542_199_500  # 2018-11-14
NOW = BASE + 10 * 86400  # 10 days later: BASE partition is "old"


def old_points(spark):
    # one old day with sub-minute points + a duplicate (LWW) version
    rows = []
    for i in range(10):
        rows.append(("one_min.srv.cpu", float(i), BASE + i * 30, 1))
    rows.append(("one_min.srv.cpu", 99.0, BASE, 2))  # supersedes value 0.0
    for i in range(10):
        rows.append(("one_min.srv.req.count", 1.0, BASE + i * 30, 1))
    return make_data(spark, rows)


def test_rollup_partition_semantics(spark):
    rolled = rollup_partition(spark, old_points(spark), PROVIDER, NOW).collect()
    by_metric = {}
    for r in rolled:
        by_metric.setdefault(r["metric"], []).append(r)
    # 300 s buckets at age 10 d: points span [BASE, BASE+300) -> one bucket each
    cpu = sorted(by_metric["one_min.srv.cpu"], key=lambda r: r["timestamp"])
    assert len(cpu) == 1
    # avg of LWW-deduped values: {99.0, 1..9} -> (99 + 45) / 10
    assert cpu[0]["value"] == pytest.approx((99.0 + sum(range(1, 10))) / 10)
    cnt = by_metric["one_min.srv.req.count"]
    assert len(cnt) == 1
    assert cnt[0]["value"] == 10.0  # sum pattern
    # bucket is aligned to precision grid
    assert cpu[0]["timestamp"] % 300 == 0


def test_compaction_invariance(spark, tmp_path):
    """Query results identical before/after compaction."""
    path = str(tmp_path / "data")
    fresh = [("one_min.srv.cpu", 5.0, NOW - 30, 1), ("one_min.srv.cpu", 7.0, NOW - 90, 1)]
    write_data(old_points(spark).unionByName(make_data(spark, fresh)), path)

    service = MetricDataService(PROVIDER)
    names = ["one_min.srv.cpu", "one_min.srv.req.count"]
    params = MetricDataQueryParams.create(
        [PROVIDER.get_retention(n) for n in names], BASE - 300, NOW, -1, now_seconds=NOW
    )
    before = service.get_data(spark, read_data(spark, path), names, BASE - 300, NOW, params=params)

    rewritten = compact_data_table(spark, path, PROVIDER, now_seconds=NOW, min_age_seconds=7 * 86400)
    assert rewritten == ["2018-11-14"]
    after = service.get_data(spark, read_data(spark, path), names, BASE - 300, NOW, params=params)
    assert before == after

    # compaction actually shrank the old partition
    old_rows = read_data(spark, path).filter(F.col("date") == "2018-11-14").count()
    assert old_rows == 2  # one 300s bucket per metric

    # idempotent: second run rewrites to the same result
    compact_data_table(spark, path, PROVIDER, now_seconds=NOW, min_age_seconds=7 * 86400)
    again = service.get_data(spark, read_data(spark, path), names, BASE - 300, NOW, params=params)
    assert again == before
