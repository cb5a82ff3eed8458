"""S12: counter flush semantics + lines re-enter the ingest parser."""

from pyspark.sql import functions as F

from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.statistics import StatisticsService


def test_flush_resets_and_rounds():
    s = StatisticsService(flush_period_seconds=5)
    s.accumulate("metric_cacher.received", 10)
    s.accumulate("metric_cacher.received", 5)
    s.accumulate("web.requests")
    s.register_gauge("queue_size", lambda: 42.0)
    lines = s.flush(now_seconds=1542199503)  # rounds down to ...500
    assert lines == [
        "five_sec.graphouse.statistics.metric_cacher.received 15.0 1542199500",
        "five_sec.graphouse.statistics.web.requests 1.0 1542199500",
        "five_sec.graphouse.statistics.queue_size 42.0 1542199500",
    ]
    # counters reset, gauges persist
    lines2 = s.flush(now_seconds=1542199508)
    assert lines2 == ["five_sec.graphouse.statistics.queue_size 42.0 1542199505"]


def test_flush_lines_are_ingestable(spark):
    s = StatisticsService()
    s.accumulate("metric_cacher.written", 100)
    lines = s.flush(now_seconds=1542199500)
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    parsed = parse_lines(raw, updated=F.lit(1542199500)).collect()
    assert len(parsed) == 1
    assert parsed[0]["name"] == "five_sec.graphouse.statistics.metric_cacher.written"
    assert parsed[0]["value"] == 100.0
