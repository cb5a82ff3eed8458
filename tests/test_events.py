"""Graphite events extension: store, window/tag filters, the
events(*tags) render function, and the HTTP API e2e."""

import json
import urllib.parse
import urllib.request

import pytest

from graphouse_spark import events as E


def test_write_and_filter_events(spark, tmp_path):
    path = str(tmp_path / "events")
    stored = E.write_events(spark, path, [
        {"what": "deploy A", "tags": ["deploy", "prod"], "when": 1000},
        {"what": "deploy B", "tags": "deploy staging", "when": 2000},
        {"what": "incident", "tags": ["outage"], "when": 3000,
         "data": "sev1"},
    ])
    assert len(stored) == 3 and all(r["id"] for r in stored)
    df = E.read_events(spark, path)
    assert df.count() == 3
    # conjunctive tag filter
    got = E.filter_events(df, None, None, ["deploy", "prod"]).collect()
    assert [r["what"] for r in got] == ["deploy A"]
    # string tags split on spaces (graphite's legacy spelling)
    got = E.filter_events(df, None, None, ["staging"]).collect()
    assert [r["what"] for r in got] == ["deploy B"]
    # window filter
    got = E.filter_events(df, 1500, 2500, None).collect()
    assert [r["what"] for r in got] == ["deploy B"]
    # ids are deterministic for identical payloads (crc32, not the
    # per-process-salted python hash)
    again = E.write_events(spark, str(tmp_path / "e2"), [
        {"what": "deploy A", "tags": ["deploy", "prod"], "when": 1000}])
    assert again[0]["id"] == stored[0]["id"]
    with pytest.raises(ValueError, match="what"):
        E.write_events(spark, path, [{"tags": ["x"]}])


def test_events_series_and_render_function(spark, tmp_path):
    from graphouse_spark.functions.target import evaluate_target

    path = str(tmp_path / "events")
    E.write_events(spark, path, [
        {"what": "d1", "tags": ["deploy"], "when": 1000},
        {"what": "d2", "tags": ["deploy"], "when": 2000},
        {"what": "other", "tags": ["noise"], "when": 1500},
    ])
    frame = E.read_events(spark, path)
    base = spark.createDataFrame([("m", 0, 1.0)],
                                 "metric string, ts long, value double")
    got = evaluate_target(base, "events('deploy')", events=frame)
    rows = sorted((r["ts"], r["value"]) for r in got.collect())
    assert rows == [(1000, 1.0), (2000, 1.0)]
    assert got.first()["metric"] == 'events("deploy")'
    # window bounds flow from the render window
    got = evaluate_target(base, "events('deploy')", start=1500, end=2500,
                          events=frame)
    assert [r["ts"] for r in got.collect()] == [2000]
    # no tags -> every event, named plain 'events'
    got = evaluate_target(base, "events()", events=frame)
    assert got.count() == 3
    # composes: drawAsInfinite passthrough keeps the marker shape
    got = evaluate_target(base, "drawAsInfinite(events('deploy'))",
                          events=frame)
    assert got.count() == 2
    # unconfigured store -> clean error
    with pytest.raises(ValueError, match="events store"):
        evaluate_target(base, "events('deploy')")


def test_events_http_api_e2e(spark, tmp_path):
    import time as _time

    from pyspark.sql import functions as F

    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.retention import (
        CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
    from graphouse_spark.sources.graphite import parse_lines
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = 1_542_199_500
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    raw = spark.createDataFrame(
        [(f"one_min.e.cpu 1.0 {BASE}",), (f"one_min.e.cpu 2.0 {BASE + 60}",)],
        "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, provider,
                           events_path=str(tmp_path / "events"))
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]
    try:
        # POST one event + a list
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/events",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return json.loads(urllib.request.urlopen(req).read().decode())

        one = post({"what": "deploy", "tags": ["deploy", "prod"],
                    "when": BASE + 30})
        assert one[0]["what"] == "deploy"
        post([{"what": "noise", "tags": ["other"], "when": BASE + 90}])

        # get_data with window + tags
        u = (f"http://127.0.0.1:{port}/events/get_data?"
             + urllib.parse.urlencode({"from": BASE, "until": BASE + 60,
                                       "tags": "deploy prod"}))
        got = json.loads(urllib.request.urlopen(u).read().decode())
        assert [e["what"] for e in got] == ["deploy"]
        assert got[0]["tags"] == ["deploy", "prod"]

        # events() renders through the real /render path
        t = urllib.parse.quote("events('deploy')")
        u = (f"http://127.0.0.1:{port}/render?target={t}"
             f"&from={BASE - 10}&until={BASE + 190}&format=json")
        body = json.loads(urllib.request.urlopen(u).read().decode())
        assert [s["target"] for s in body] == ['events("deploy")']
        assert [p for p in body[0]["datapoints"] if p[0] is not None] == \
            [[1.0, BASE + 30]]
    finally:
        server.shutdown()


def test_events_frame_never_mutates_global_schema(spark, tmp_path):
    """Regression: StructType.add MUTATES self, so building the
    empty-store frame via EVENTS_SCHEMA.add('date', ...) appended a
    duplicate 'date' field to the module global on every /render or
    /events/get_data against a configured-but-empty store, breaking
    all later event writes until restart. The frame must be built from
    a fresh StructType."""
    from graphouse_spark import events as ev_mod
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch
    from graphouse_spark.sources.graphite import parse_lines
    from pyspark.sql import functions as F

    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    raw = spark.createDataFrame([("one_min.ev.a 1.0 1000",)], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(100)), cfg, known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           events_path=str(tmp_path / "events"))

    before = [f.name for f in ev_mod.EVENTS_SCHEMA.fields]
    # empty-store reads, repeatedly (each used to append a 'date' field)
    for _ in range(3):
        frame = svc._events_frame()
        assert [f.name for f in frame.schema.fields].count("date") == 1
    assert [f.name for f in ev_mod.EVENTS_SCHEMA.fields] == before
    # a write + read after the empty-store reads still works
    svc.add_events({"what": "deploy", "when": 1234, "tags": ["prod"]})
    got = json.loads(svc.events_get_data(None, None, None))
    assert [e["what"] for e in got] == ["deploy"]
