"""CH mutations (ALTER DELETE/UPDATE WHERE) as atomic partition rewrites."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.mutate import delete_where, ttl_delete, update_where
from graphouse_spark.sources.tables import read_data, write_data
from tests.test_read_path import make_data

BASE = 1_542_199_500  # 2018-11-14


@pytest.fixture()
def lake(spark, tmp_path):
    rows = []
    for day in range(3):
        for i in range(10):
            ts = BASE + day * 86400 + i * 60
            rows.append((f"m.u{i % 2}", float(i), ts, 1))
    path = str(tmp_path / "data")
    write_data(make_data(spark, rows), path)
    return path


def test_delete_where_rewrites_only_affected_partitions(spark, lake):
    before = read_data(spark, lake)
    assert before.count() == 30
    # predicate touches only day 1
    cond = (F.col("timestamp") >= BASE + 86400) & \
           (F.col("timestamp") < BASE + 86400 + 300) & (F.col("metric") == "m.u1")
    rewritten = delete_where(spark, lake, cond)
    assert rewritten == ["2018-11-15"]
    after = read_data(spark, lake)
    assert after.count() == 30 - 2  # m.u1 rows at offsets 60 and 180 (< 300 s)
    assert after.filter(cond).count() == 0
    # untouched partitions bit-identical in content
    assert after.filter(F.col("date") == "2018-11-14").count() == 10

    # idempotent: nothing matches now -> no partitions rewritten
    assert delete_where(spark, lake, cond) == []


def test_delete_everything_in_partition_leaves_table_readable(spark, lake):
    cond = F.col("date") == F.lit("2018-11-16").cast("date")
    rewritten = delete_where(spark, lake, cond)
    assert rewritten == ["2018-11-16"]
    after = read_data(spark, lake)
    assert after.count() == 20
    assert after.filter("date = '2018-11-16'").count() == 0


def test_update_where_assigns_matching_rows_only(spark, lake):
    cond = (F.col("metric") == "m.u0") & (F.col("date") == F.lit("2018-11-14").cast("date"))
    rewritten = update_where(spark, lake, cond, {"value": F.col("value") * 100})
    assert rewritten == ["2018-11-14"]
    after = read_data(spark, lake)
    updated = after.filter(cond).agg(F.min("value"), F.max("value")).collect()[0]
    assert updated[0] == 0.0 and updated[1] == 800.0  # 0,2,4,6,8 * 100
    untouched = after.filter(~cond).agg(F.max("value")).collect()[0][0]
    assert untouched == 9.0
    with pytest.raises(ValueError, match="partitioning column"):
        update_where(spark, lake, cond, {"date": F.lit("2020-01-01")})


def test_ttl_delete_drops_old_rows(spark, lake):
    now = BASE + 3 * 86400
    rewritten = ttl_delete(spark, lake, max_age_seconds=2 * 86400, now_seconds=now)
    assert rewritten == ["2018-11-14"]
    after = read_data(spark, lake)
    assert after.count() == 20
    assert after.agg(F.min("timestamp")).collect()[0][0] >= now - 2 * 86400


def test_mutation_queries_unchanged_for_unaffected_metrics(spark, lake):
    """The scan layout (partitioning, sort) survives a mutation."""
    delete_where(spark, lake, F.col("metric") == "m.u1")
    after = read_data(spark, lake)
    assert after.select("metric").distinct().collect() == [("m.u0",)] or \
           {r["metric"] for r in after.select("metric").distinct().collect()} == {"m.u0"}
    # date partition dirs still present and pruned reads still work
    one_day = after.filter(F.col("date") == "2018-11-15")
    assert one_day.count() == 5
