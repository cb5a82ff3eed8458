"""Read-path goldens ported from MetricDataRowCallbackHandlerTest.java:23-133.

The reference's golden JSON (bucket alignment, null gap-fill
before/between/after points, NaN -> null, empty result, full-null
series for matched-but-dataless metrics) is the contract for
``MetricDataService.get_data``.
"""

import json
import math

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.bucket import bucket_aggregate
from graphouse_spark.operators.dedup import dedup_points
from graphouse_spark.plans.metricdata import MetricDataService, filter_points, metric_series
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import CombinedRetentionProvider, MetricRetention, MetricRetentionConfig
from graphouse_spark.schemas import DATA_SCHEMA


def make_data(spark, rows):
    """rows: (metric, value, timestamp, updated) — date derived."""
    df = spark.createDataFrame(
        [(m, v, t, u) for (m, v, t, u) in rows],
        "metric string, value double, timestamp long, updated long",
    )
    return df.withColumn("date", F.to_date(F.from_unixtime("timestamp"))).select(
        "metric", "value", "timestamp", "date", "updated"
    )


@pytest.fixture()
def service():
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))]
    )
    return MetricDataService(provider)


def test_handler_golden(spark, service):
    # testHandler: the handler consumes already-bucketed rows; gap fill +
    # render must produce the reference's golden JSON.
    from graphouse_spark.plans.metricdata import render_series

    rows = [
        {"metric": "name1", "ts": 100, "value": 33.33},
        {"metric": "name1", "ts": 160, "value": 42.0},
        {"metric": "name2", "ts": 160, "value": 32.0},
        {"metric": "name2", "ts": 220, "value": 77.7},
    ]
    out = render_series(rows, MetricDataQueryParams(100, 280, 60), ["name1", "name2"])
    assert out == {
        "name1": {"start": 100, "end": 280, "step": 60, "points": [33.33, 42.0, None]},
        "name2": {"start": 100, "end": 280, "step": 60, "points": [None, 32.0, 77.7]},
    }


def test_full_pipeline_snapped(spark, service):
    # end-to-end: raw duplicated points -> dedup -> bucket -> gap fill,
    # with real (snapped) query params
    data = make_data(spark, [
        ("name1", 99.0, 105, 1),   # superseded by updated=2
        ("name1", 33.33, 105, 2),
        ("name1", 42.0, 160, 1),
        ("name2", 32.0, 165, 1),
        ("name2", 77.7, 220, 1),
    ])
    out = service.get_data(spark, data, ["name1", "name2"], 100, 280, now_seconds=280)
    # snapped: start 60, end 60 + 3*60 = 240 -> grid {60, 120, 180}
    assert out == {
        "name1": {"start": 60, "end": 240, "step": 60, "points": [33.33, 42.0, None]},
        "name2": {"start": 60, "end": 240, "step": 60, "points": [None, 32.0, 77.7]},
    }


def test_nan_to_null(spark):
    # testChNan: NaN value -> null point, bucket still advances
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 1}))]
    )
    service = MetricDataService(provider)
    data = make_data(spark, [
        ("name1", 0.0, 0, 1),
        ("name1", float("nan"), 1, 1),
        ("name1", 2.0, 2, 1),
    ])
    out = service.get_data(spark, data, ["name1"], 0, 3, now_seconds=3)
    assert out == {"name1": {"start": 0, "end": 3, "step": 1, "points": [0.0, None, 2.0]}}


def test_empty(spark, service):
    out = service.get_data(spark, make_data(spark, []), [], 0, 3, now_seconds=3)
    assert out == {}


def test_empty_metric_filling(spark, service):
    # testEmptyMetricFilling: matched-but-dataless metrics emit full null series
    data = make_data(spark, [("name1", 33.33, 120, 1), ("name1", 42.0, 180, 1)])
    out = service.get_data(spark, data, ["name1", "name2", "name3"], 120, 300, now_seconds=300)
    assert out["name1"]["points"] == [33.33, 42.0, None]
    assert out["name2"]["points"] == [None, None, None]
    assert out["name3"] == {"start": 120, "end": 300, "step": 60, "points": [None, None, None]}


def test_lww_dedup(spark):
    # duplicate (metric, ts) with different updated -> max-updated wins
    data = make_data(spark, [
        ("m.a.x", 1.0, 100, 10),
        ("m.a.x", 2.0, 100, 20),
        ("m.a.x", 99.0, 100, 5),
    ])
    got = dedup_points(data).collect()
    assert len(got) == 1
    assert got[0]["value"] == 2.0
    assert got[0]["updated"] == 20


def test_bucket_functions(spark):
    data = make_data(spark, [
        ("m", 1.0, 0, 1), ("m", 3.0, 30, 1), ("m", 10.0, 60, 1),
    ])
    avg = {r["ts"]: r["value"] for r in bucket_aggregate(data, 60, "avg").collect()}
    assert avg == {0: 2.0, 60: 10.0}
    mx = {r["ts"]: r["value"] for r in bucket_aggregate(data, 60, "max").collect()}
    assert mx == {0: 3.0, 60: 10.0}
    sm = {r["ts"]: r["value"] for r in bucket_aggregate(data, 60, "sum").collect()}
    assert sm == {0: 4.0, 60: 10.0}
    with pytest.raises(ValueError):
        bucket_aggregate(data, 60, "median")


def test_multi_function_groups(spark):
    # metrics spanning two retention functions run as separate groups, same params
    provider = CombinedRetentionProvider([
        MetricRetentionConfig("max\\..*", False, MetricRetention("max", {0: 60})),
        MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60})),
    ])
    service = MetricDataService(provider)
    data = make_data(spark, [
        ("max.m", 1.0, 100, 1), ("max.m", 5.0, 110, 1),
        ("avg.m", 1.0, 100, 1), ("avg.m", 5.0, 110, 1),
    ])
    out = service.get_data(spark, data, ["max.m", "avg.m"], 100, 160, now_seconds=160)
    assert out["max.m"]["points"] == [5.0]
    assert out["avg.m"]["points"] == [3.0]


def test_filter_pushdown_shape(spark, tmp_path):
    # F1/F2/F3 must reach the parquet scan: PushedFilters + PartitionFilters
    from graphouse_spark.sources.tables import read_data, write_data

    import contextlib
    import io

    path = str(tmp_path / "data")
    write_data(make_data(spark, [("m.a.b", 1.0, 1542199500 + i, 1) for i in range(100)]), path)
    df = filter_points(read_data(spark, path), ["m.a.b"], 1542199500, 1542199560)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    formatted = buf.getvalue()
    assert "PushedFilters" in formatted
    pushed = formatted.split("PushedFilters")[1]
    assert "timestamp" in pushed[:500] and "metric" in pushed[:500]
    assert "PartitionFilters" in formatted  # date predicate prunes partitions


def test_salted_aggregate_matches_plain(spark):
    """Salted two-phase agg must equal the direct aggregation exactly
    for decomposable functions (and reject non-decomposable ones)."""
    import pytest as _pytest

    from graphouse_spark.operators.skew import salted_aggregate

    # hot key: one metric holds 90% of rows
    rows = [("hot.metric.x", float(i % 13), 100 + i, 1) for i in range(900)]
    rows += [(f"cold.metric.{i}", float(i), 100 + i, 1) for i in range(100)]
    data = make_data(spark, rows)

    for fn in ["avg", "sum", "min", "max", "count"]:
        salted = {r["metric"]: r["value"] for r in salted_aggregate(data, ["metric"], "value", fn).collect()}
        if fn == "avg":
            plain = {r["metric"]: r["v"] for r in data.groupBy("metric").agg(F.avg("value").alias("v")).collect()}
            assert salted.keys() == plain.keys()
            for k in plain:
                assert abs(salted[k] - plain[k]) < 1e-9, (fn, k)
        else:
            agg = {"sum": F.sum, "min": F.min, "max": F.max, "count": lambda c: F.count(F.lit(1))}[fn]
            plain = {r["metric"]: r["v"] for r in data.groupBy("metric").agg(agg("value").alias("v")).collect()}
            assert salted == plain, fn

    with _pytest.raises(ValueError):
        salted_aggregate(data, ["metric"], "value", "median")


def test_utc_day_boundary_date_derivation(spark, tmp_path):
    """C11 analog of MetricsStreamCallbackTest.testTimeZones: the
    reference derives the date partition in the ClickHouse server TZ
    (Moscow in the golden: 1491771599 -> day 17265, 1491771601 ->
    17266); this engine pins UTC and documents the delta. The UTC
    boundary for those instants is 1491782400 (2017-04-10T00:00Z)."""
    import datetime

    from graphouse_spark.sources.tables import write_data

    rows = [
        ("m.a", 1.0, 1491771599, 1),  # Moscow flips here; UTC must NOT
        ("m.a", 2.0, 1491771601, 1),
        ("m.a", 3.0, 1491782399, 1),  # 2017-04-09T23:59:59Z
        ("m.a", 4.0, 1491782400, 1),  # 2017-04-10T00:00:00Z
    ]
    df = make_data(spark, rows)
    path = str(tmp_path / "tzdata")
    write_data(df, path)
    got = {r["timestamp"]: r["date"] for r in spark.read.parquet(path).collect()}
    d9, d10 = datetime.date(2017, 4, 9), datetime.date(2017, 4, 10)
    assert got[1491771599] == d9 and got[1491771601] == d9  # diverges from Moscow golden
    assert got[1491782399] == d9 and got[1491782400] == d10  # UTC boundary exact


def test_mixed_retention_per_group_params(spark):
    # MetricDataService.java:55-58: params are computed PER function group,
    # so a mixed-retention request renders the finer group at its own step
    # instead of the global max step.
    provider = CombinedRetentionProvider([
        MetricRetentionConfig("coarse\\..*", False, MetricRetention("max", {0: 300})),
        MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60})),
    ])
    service = MetricDataService(provider)
    data = make_data(spark, [
        ("coarse.m", 1.0, 30, 1), ("coarse.m", 5.0, 290, 1),
        ("fine.m", 2.0, 30, 1), ("fine.m", 4.0, 90, 1),
    ])
    out = service.get_data(spark, data, ["coarse.m", "fine.m"], 0, 600, now_seconds=600)
    assert out["coarse.m"]["step"] == 300
    assert out["fine.m"]["step"] == 60
    assert out["coarse.m"]["points"] == [5.0, None]
    assert out["fine.m"]["points"] == [2.0, 4.0] + [None] * 8


def test_infinity_to_null(spark):
    # Double.isFinite at render: Infinity must become null (bare Infinity
    # is not valid strict JSON), same as NaN.
    from graphouse_spark.plans.metricdata import render_series

    rows = [
        {"metric": "m", "ts": 0, "value": float("inf")},
        {"metric": "m", "ts": 60, "value": float("-inf")},
        {"metric": "m", "ts": 120, "value": 1.5},
    ]
    out = render_series(rows, MetricDataQueryParams(0, 180, 60), ["m"])
    assert out["m"]["points"] == [None, None, 1.5]
    assert "Infinity" not in json.dumps(out)


def test_register_corpus_sql_front_door(spark):
    """Every corpus table reachable from plain spark.sql, any ts encoding."""
    from graphouse_spark import register_corpus

    register_corpus(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0
    # events_sec normalizes the physical time encoding (nanos-bigint,
    # timestamp, or timestamp_ntz) to epoch seconds
    row = spark.sql(
        "SELECT count(*) AS n, min(ts_sec) AS first_sec FROM events_sec"
    ).collect()[0]
    assert row["n"] > 0 and row["first_sec"] >= 1704067200


def test_table_stats_and_compaction_candidates(spark, tmp_path):
    """system.parts analog: per-file rows/bytes/ranges; fragmented
    partitions surface as compaction candidates."""
    from graphouse_spark.sources.tables import (
        compaction_candidates,
        table_stats,
        write_data,
    )

    base = 1_542_199_500
    rows = [(f"m.{i % 3}", float(i), base + i * 60, base) for i in range(300)]
    df = spark.createDataFrame(rows, "metric string, value double, timestamp long, updated long")
    path = str(tmp_path / "parts")
    write_data(df, path, target_partitions=6)  # several small files
    stats = table_stats(spark, path).collect()
    assert len(stats) >= 1
    total_rows = sum(r["n_rows"] for r in stats)
    assert total_rows == 300
    for r in stats:
        assert r["bytes"] is not None and r["bytes"] > 0
        assert r["min_metric"] <= r["max_metric"]
        assert r["min_ts"] <= r["max_ts"]
        assert str(r["date"]) != ""
    cands = compaction_candidates(
        table_stats(spark, path), small_bytes=1 << 30, min_files=2
    ).collect()
    # every partition here is tiny -> all flagged at a 1 GiB threshold
    assert cands and all(c["n_small_files"] >= 2 for c in cands)
    assert sum(c["rows_affected"] for c in cands) == 300
