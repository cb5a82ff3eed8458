"""Streaming windowed rollup: buckets emitted after the watermark passes;
too-late points dropped (the documented divergence from the batch path)."""

import time

import pytest

from graphouse_spark.schemas import LINE_SCHEMA
from graphouse_spark.streaming.windowed import windowed_rollup

BASE = 1_542_199_500


@pytest.mark.slow
def test_windowed_rollup_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()

    # batch 1: two full 60s windows + an advancing point far ahead
    rows1 = (
        [("m.a.cpu", float(v), BASE + i, BASE + i) for i, v in enumerate([2, 4, 6])]
        + [("m.a.cpu", 10.0, BASE + 70, BASE + 70)]
        + [("m.a.cpu", 1.0, BASE + 1000, BASE + 1000)]  # pushes the watermark
    )
    spark.createDataFrame(rows1, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(LINE_SCHEMA).parquet(str(src / "*"))
    query = (
        windowed_rollup(stream, step_seconds=60, watermark_delay="2 minutes")
        .writeStream.format("memory")
        .queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        # second batch: a point 1000s late -> beyond the 2min watermark, dropped
        rows2 = [
            ("m.a.cpu", 99.0, BASE + 5, BASE + 1010),     # too late: window closed
            ("m.a.cpu", 3.0, BASE + 1010, BASE + 1010),   # fresh: accepted
            ("m.a.cpu", 1.0, BASE + 2000, BASE + 2000),   # advance watermark again
        ]
        spark.createDataFrame(rows2, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()

        got = {r["ts"]: (r["value"], r["n_points"]) for r in spark.sql("SELECT * FROM rollup_out").collect()}
        window1 = BASE - BASE % 60
        assert got[window1] == (4.0, 3)       # avg(2,4,6); late 99.0 NOT merged
        assert got[window1 + 60] == (10.0, 1)
        assert (BASE + 1000) - (BASE + 1000) % 60 in got
    finally:
        query.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from graphouse_spark.streaming.windowed import streaming_dedup

    src = tmp_path / "din"
    src.mkdir()
    rows1 = [
        ("m.a.cpu", 1.0, BASE, BASE),
        ("m.a.cpu", 1.5, BASE, BASE + 1),      # same (name, timestamp): duplicate
        ("m.b.cpu", 2.0, BASE, BASE),
    ]
    spark.createDataFrame(rows1, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(LINE_SCHEMA).parquet(str(src / "*"))
    query = (
        streaming_dedup(stream, delay="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        # a cross-batch duplicate inside the horizon is dropped too
        rows2 = [("m.a.cpu", 9.9, BASE, BASE + 2), ("m.c.cpu", 3.0, BASE + 5, BASE + 5)]
        spark.createDataFrame(rows2, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()
        out = spark.table("dedup_out").collect()
    finally:
        query.stop()
    got = {(r["name"], r["timestamp"]): r["value"] for r in out}
    assert len(out) == 3                      # 5 inputs, 2 duplicates dropped
    assert got[("m.a.cpu", BASE)] == 1.0      # first occurrence won
    assert ("m.c.cpu", BASE + 5) in got


def test_timeshift_and_graphite_function_family(spark):
    """functions/timeseries.py: unit semantics on a hand-checkable series."""
    from graphouse_spark.functions.timeseries import (
        moving_average,
        non_negative_derivative,
        running_total,
        sum_series,
        time_shift,
    )

    rows = [("m1", 0, 10.0), ("m1", 60, 20.0), ("m1", 120, 5.0),
            ("m2", 0, 1.0), ("m2", 60, 2.0)]
    s = spark.createDataFrame(rows, "metric string, ts long, value double")

    ma = {(r["metric"], r["ts"]): r["moving_avg"] for r in moving_average(s, 2).collect()}
    assert ma[("m1", 60)] == 15.0 and ma[("m1", 120)] == 12.5 and ma[("m2", 0)] == 1.0

    rt = {(r["metric"], r["ts"]): r["running_total"] for r in running_total(s).collect()}
    assert rt[("m1", 120)] == 35.0

    nn = {(r["metric"], r["ts"]): r["rate"] for r in non_negative_derivative(s).collect()}
    assert nn[("m1", 0)] is None                      # no predecessor
    assert nn[("m1", 60)] == pytest.approx(10 / 60, abs=1e-6)  # rising counter (rounded to 6)
    assert nn[("m1", 120)] is None                    # reset -> None, not negative

    shifted = {(r["metric"], r["ts"]) for r in time_shift(s, 3600).collect()}
    assert ("m1", 3600) in shifted and ("m1", 0) not in shifted

    ss = {r["ts"]: (r["sum_value"], r["n_series"]) for r in sum_series(s).collect()}
    assert ss[0] == (11.0, 2) and ss[120] == (5.0, 1)  # missing bucket skipped


def test_percentile_and_alias_by_node(spark):
    from graphouse_spark.functions.timeseries import alias_by_node, percentile_of_series

    s = spark.createDataFrame(
        [("one_min.srv1.cpu", 0, 1.0), ("one_min.srv2.cpu", 0, 3.0), ("one_min.srv1.cpu", 60, 5.0)],
        "metric string, ts long, value double",
    )
    med = {r["ts"]: r["pct_value"] for r in percentile_of_series(s, 0.5).collect()}
    # graphite rank convention: ceil(0.5 * 3) = rank 2 of [1, 3] -> 3.0
    assert med == {0: 3.0, 60: 5.0}
    interp = {r["ts"]: r["pct_value"]
              for r in percentile_of_series(s, 0.5, interpolate=True).collect()}
    # interpolated: rank 1, frac 0.5 -> 1 + 0.5 * (3 - 1) = 2.0
    assert interp == {0: 2.0, 60: 5.0}

    assert sorted({r["metric"] for r in alias_by_node(s, 1).collect()}) == ["srv1", "srv2"]
    assert {r["metric"] for r in alias_by_node(s, -1).collect()} == {"cpu"}


def test_stream_static_enrichment(spark, tmp_path):
    from pyspark.sql import functions as F

    from graphouse_spark.streaming.windowed import enrich_with_dimension

    src = tmp_path / "ein"
    src.mkdir()
    rows = [("m.a.cpu", 1.0, BASE, BASE), ("m.b.cpu", 2.0, BASE, BASE)]
    spark.createDataFrame(rows, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    dim = spark.createDataFrame([("m.a.cpu", "team-x")], "name string, owner string")
    stream = spark.readStream.schema(LINE_SCHEMA).parquet(str(src / "*"))
    query = (
        enrich_with_dimension(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched_out")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        got = {r["name"]: r["owner"] for r in spark.table("enriched_out").collect()}
    finally:
        query.stop()
    assert got == {"m.a.cpu": "team-x", "m.b.cpu": None}  # left join keeps unknowns


def test_group_by_node(spark):
    from graphouse_spark.functions.timeseries import group_by_node

    s = spark.createDataFrame(
        [("dc1.srv1.cpu", 0, 1.0), ("dc1.srv2.cpu", 0, 3.0), ("dc2.srv3.cpu", 0, 7.0)],
        "metric string, ts long, value double",
    )
    by_dc = {(r["metric"], r["ts"]): r["value"] for r in group_by_node(s, 0, "sum").collect()}
    assert by_dc == {("dc1", 0): 4.0, ("dc2", 0): 7.0}
    # graphite's aggFuncs table includes median (and alias spellings)
    by_med = {(r["metric"], r["ts"]): r["value"]
              for r in group_by_node(s, 0, "median").collect()}
    assert by_med == {("dc1", 0): 2.0, ("dc2", 0): 7.0}
    with pytest.raises(ValueError):
        group_by_node(s, 0, "no-such-agg")


def test_stream_stream_attribution_join(spark, tmp_path):
    from graphouse_spark.streaming.windowed import stream_stream_attribution

    csrc, vsrc = tmp_path / "clicks", tmp_path / "views"
    csrc.mkdir(); vsrc.mkdir()
    schema = "user_id long, ts_sec long, value double"
    # user 1: view 100s before click (inside 600s horizon)
    # user 2: view 1000s before click (outside horizon)
    # user 3: view AFTER the click (never attributable)
    clicks = [(1, BASE + 700, 10.0), (2, BASE + 1200, 20.0), (3, BASE + 100, 30.0)]
    views = [(1, BASE + 600, 1.0), (2, BASE + 200, 2.0), (3, BASE + 300, 3.0)]
    spark.createDataFrame(clicks, schema).coalesce(1).write.parquet(str(csrc / "b1"))
    spark.createDataFrame(views, schema).coalesce(1).write.parquet(str(vsrc / "b1"))

    cstream = spark.readStream.schema(schema).parquet(str(csrc / "*"))
    vstream = spark.readStream.schema(schema).parquet(str(vsrc / "*"))
    query = (
        stream_stream_attribution(cstream, vstream, horizon_seconds=600)
        .writeStream.format("memory")
        .queryName("attrib_out")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        rows = spark.table("attrib_out").collect()
    finally:
        query.stop()
    got = {(r["user_id"], r["click_ts"], r["view_ts"]) for r in rows}
    assert got == {(1, BASE + 700, BASE + 600)}


def test_holt_winters_forecast_recurrence(spark):
    """Hand-computed double-exponential smoothing (alpha=.5, beta=.5)."""
    from graphouse_spark.functions.timeseries import holt_winters_forecast

    s = spark.createDataFrame(
        [("m1", 0, 10.0), ("m1", 60, 12.0), ("m1", 120, 14.0), ("m2", 0, 5.0)],
        "metric string, ts long, value double",
    )
    rows = {(r["metric"], r["ts"]): (r["forecast"], r["deviation"])
            for r in holt_winters_forecast(s, alpha=0.5, beta=0.5).collect()}
    assert rows[("m1", 0)] == (None, None)          # no history yet
    assert rows[("m1", 60)] == (10.0, 0.2)          # level=10, trend=0
    # level=11, trend=0.5 -> forecast 11.5; dev = .1*2.5 + .9*.2 = .43
    assert rows[("m1", 120)] == (11.5, 0.43)
    assert rows[("m2", 0)] == (None, None)          # independent series


def test_windowed_distinct_users_stream(spark, tmp_path):
    from graphouse_spark.streaming.windowed import windowed_distinct_users

    src = tmp_path / "uin"
    src.mkdir()
    schema = "user_id long, ts_sec long, value double"
    rows1 = ([(u, BASE + u, 1.0) for u in range(1, 6)]          # 5 users, window 1
             + [(1, BASE + 10, 1.0), (2, BASE + 11, 1.0)]       # repeats: still 5
             + [(9, BASE + 7200, 1.0)])                         # advances watermark
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    query = (
        windowed_distinct_users(stream, step_seconds=3600, watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("du_out")
        .option("checkpointLocation", str(tmp_path / "uckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        # one more far-future point closes the second window too
        spark.createDataFrame([(9, BASE + 20000, 1.0)], schema).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()
        got = {r["ts"]: r["approx_users"] for r in spark.table("du_out").collect()}
    finally:
        query.stop()
    w1 = BASE - BASE % 3600
    assert got[w1] == 5  # HLL is exact at tiny cardinalities


@pytest.mark.slow
def test_continuous_aggregate_merges_late_data(spark, tmp_path):
    """The maintained rollup table: late points UPDATE their original
    bucket (unlike the watermarked append stream), merges are partial-
    aggregate additions, and batch replays are idempotent."""
    from graphouse_spark.streaming.windowed import (
        continuous_aggregate_partials,
        merge_continuous_aggregate,
        read_continuous_aggregate,
        start_continuous_aggregate,
    )

    src = tmp_path / "cin"
    src.mkdir()
    table = str(tmp_path / "cagg")

    rows1 = [
        ("m.a.cpu", 2.0, BASE, BASE),
        ("m.a.cpu", 4.0, BASE + 10, BASE + 10),
        ("m.b.cpu", 1.0, BASE + 10, BASE + 10),
    ]
    spark.createDataFrame(rows1, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(LINE_SCHEMA).parquet(str(src / "*"))
    query = start_continuous_aggregate(
        stream, table, checkpoint_dir=str(tmp_path / "cckpt"), step_seconds=300
    )
    try:
        query.processAllAvailable()
        bucket = BASE - BASE % 300
        got = {(r["metric"], r["ts"]): (r["value"], r["n_points"])
               for r in read_continuous_aggregate(spark, table).collect()}
        assert got[("m.a.cpu", bucket)] == (3.0, 2)
        assert got[("m.b.cpu", bucket)] == (1.0, 1)

        # batch 2: a VERY late point for the same old bucket + a fresh one —
        # both merge (no watermark drop in the maintained table)
        rows2 = [
            ("m.a.cpu", 9.0, BASE + 20, BASE + 100_000),
            ("m.a.cpu", 5.0, BASE + 100_000, BASE + 100_000),
        ]
        spark.createDataFrame(rows2, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()
        got = {(r["metric"], r["ts"]): (r["value"], r["n_points"])
               for r in read_continuous_aggregate(spark, table).collect()}
        assert got[("m.a.cpu", bucket)] == (5.0, 3)          # (2+4+9)/3
        late_bucket = (BASE + 100_000) - (BASE + 100_000) % 300
        assert got[("m.a.cpu", late_bucket)] == (5.0, 1)
    finally:
        query.stop()

    # replaying an already-absorbed batch id is a no-op (idempotence)
    replay = continuous_aggregate_partials(
        spark.createDataFrame(rows2, LINE_SCHEMA), step_seconds=300
    )
    merge_continuous_aggregate(spark, table, replay, batch_id=1)
    got = {(r["metric"], r["ts"]): (r["value"], r["n_points"])
           for r in read_continuous_aggregate(spark, table).collect()}
    assert got[("m.a.cpu", BASE - BASE % 300)] == (5.0, 3)   # unchanged


def test_holt_winters_bands_hand_math(spark):
    """Bands/aberration against the same hand recurrence the forecast
    test uses: alpha=.1 beta=.0035 gamma=.1 delta=3."""
    from graphouse_spark.functions.timeseries import holt_winters_bands

    vals = [10.0, 12.0, 11.0, 30.0, 12.5]
    rows = [("m", 60 * i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {r["ts"]: r for r in holt_winters_bands(df, delta=3.0).collect()}

    # hand recurrence
    alpha, beta, gamma = 0.1, 0.0035, 0.1
    level, trend, dev = vals[0], 0.0, 0.0
    for i, v in enumerate(vals):
        if i == 0:
            assert got[0]["upper_band"] is None and got[0]["aberration"] is None
            continue
        forecast = level + trend
        dev = gamma * abs(v - forecast) + (1 - gamma) * dev
        # the stored forecast/deviation columns are rounded to 6; the
        # bands build on those stored values
        upper = round(forecast, 6) + 3 * round(dev, 6)
        lower = round(forecast, 6) - 3 * round(dev, 6)
        r = got[60 * i]
        assert r["upper_band"] == round(upper, 6)
        assert r["lower_band"] == round(lower, 6)
        expect_ab = v - round(upper, 6) if v > round(upper, 6) else (v - round(lower, 6) if v < round(lower, 6) else 0.0)
        assert r["aberration"] == round(expect_ab, 6)
        last = level
        level = alpha * v + (1 - alpha) * (level + trend)
        trend = beta * (level - last) + (1 - beta) * trend


def test_interpolate_series_hand_math(spark):
    """graphite interpolate: linear fill between known neighbors,
    leading/trailing nulls untouched."""
    from graphouse_spark.functions.timeseries import interpolate_series

    rows = [
        ("m", 0, None),       # leading null -> stays null
        ("m", 60, 10.0),
        ("m", 120, None),     # -> 10 + (40-10)*(120-60)/(180-60) = 25
        ("m", 180, 40.0),
        ("m", 240, None),     # trailing null -> stays null
        ("n", 0, 5.0),        # other series untouched
    ]
    df = spark.createDataFrame(rows, "metric string, ts long, value double")
    got = {(r["metric"], r["ts"]): r["value"]
           for r in interpolate_series(df).collect()}
    assert got[("m", 0)] is None and got[("m", 240)] is None
    assert got[("m", 120)] == 25.0
    assert got[("m", 60)] == 10.0 and got[("n", 0)] == 5.0
