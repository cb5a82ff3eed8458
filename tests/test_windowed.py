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
