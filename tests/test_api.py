"""End-to-end gateway facade: ingest -> load tree -> search -> metricData -> ban."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.api.service import GraphouseService
from graphouse_spark.retention import CombinedRetentionProvider, MetricRetention, MetricRetentionConfig
from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

BASE = 1_542_199_500


@pytest.fixture()
def service(spark, tmp_path):
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"), str(tmp_path / "ckpt"))
    lines = [
        f"one_min.srv1.cpu {v} {BASE + i * 60}" for i, v in enumerate([1.0, 2.0, 3.0])
    ] + [
        f"one_min.srv2.cpu {v} {BASE + i * 60}" for i, v in enumerate([10.0, 20.0, 30.0])
    ] + [f"one_min.srv1.mem 5.5 {BASE}"]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)

    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))]
    )
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, provider)
    svc.load_tree()
    return svc


def test_search_contract(service):
    assert service.search("one_min.*") == "one_min.srv1.\none_min.srv2."
    assert service.search("one_min.srv1.*") == "one_min.srv1.cpu\none_min.srv1.mem"
    assert service.search("one_min.srv?.cpu") == "one_min.srv1.cpu\none_min.srv2.cpu"


def test_503_before_load(spark, tmp_path):
    svc = GraphouseService(spark, str(tmp_path / "d"), str(tmp_path / "m"))
    with pytest.raises(RuntimeError):
        svc.search("*")


def test_metric_data_glob(service):
    out = service.metric_data(["one_min.srv*.cpu"], BASE, BASE + 180, now_seconds=BASE + 180)
    assert set(out) == {"one_min.srv1.cpu", "one_min.srv2.cpu"}
    assert out["one_min.srv1.cpu"]["points"] == [1.0, 2.0, 3.0]
    assert out["one_min.srv2.cpu"]["points"] == [10.0, 20.0, 30.0]
    assert out["one_min.srv1.cpu"]["step"] == 60


def test_metric_data_visibility(service, spark):
    # unknown names vanish from the response entirely (search finds nothing)
    out = service.metric_data(["one_min.srv1.gone"], BASE, BASE + 180, now_seconds=BASE + 180)
    assert out == {}
    # a registered-but-dataless metric gets a full null series
    service.tree.add("one_min.srv1.idle")
    out2 = service.metric_data(["one_min.srv1.idle"], BASE, BASE + 180, now_seconds=BASE + 180)
    assert out2["one_min.srv1.idle"]["points"] == [None, None, None]
    # banned metrics yield no series even when named literally
    service.ban("one_min.srv1.mem")
    out3 = service.metric_data(["one_min.srv1.mem"], BASE, BASE + 180, now_seconds=BASE + 180)
    assert out3 == {}


def test_ban_and_persistence(service, spark):
    assert service.ban("one_min.srv2.") == ["one_min.srv2."]
    assert service.search("one_min.*") == "one_min.srv1."
    # ban survives a tree rebuild from the table
    svc2 = GraphouseService(spark, service.data_path, service.metrics_path, service.provider)
    svc2.load_tree()
    assert svc2.search("one_min.*") == "one_min.srv1."
    # BAN -> SIMPLE denied, APPROVED allowed
    svc2.modify("one_min.srv2.", "SIMPLE")
    assert svc2.search("one_min.*") == "one_min.srv1."
    svc2.approve("one_min.srv2.")
    assert svc2.search("one_min.*") == "one_min.srv1.\none_min.srv2."


def test_modify_503_before_load(spark, tmp_path):
    # /ban etc. must 503 until bootstrap, like every other route
    # (MetricSearchServlet.isServerNotReady) — otherwise they mutate an
    # empty tree and persist bogus rows.
    svc = GraphouseService(spark, str(tmp_path / "d"), str(tmp_path / "m"))
    with pytest.raises(RuntimeError):
        svc.modify("one_min.srv1.", "BAN")
    with pytest.raises(RuntimeError):
        svc.ban("one_min.srv1.")


def test_lazy_service_serves_without_bootstrap(spark, tmp_path):
    """lazy_tree=True answers /search and /metricData with NO load_tree
    bootstrap scan — dirs materialize on demand via the X6 batcher."""
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.sources.tables import write_data, write_metrics
    from pyspark.sql import functions as F

    base = 1_542_199_500
    data_path, metrics_path = str(tmp_path / "data"), str(tmp_path / "metrics")
    pts = [("one_min.srv1.cpu", float(i + 1), base + i * 60, 1) for i in range(3)]
    write_data(spark.createDataFrame(
        pts, "metric string, value double, timestamp long, updated long"), data_path)
    rows = [
        ("one_min.", 1, "", "SIMPLE"),
        ("one_min.srv1.", 2, "one_min.", "SIMPLE"),
        ("one_min.srv1.cpu", 3, "one_min.srv1.", "SIMPLE"),
        ("one_min.srv2.", 2, "one_min.", "SIMPLE"),
        ("one_min.srv2.cpu", 3, "one_min.srv2.", "HIDDEN"),
    ]
    write_metrics(spark.createDataFrame(
        rows, "name string, level int, parent string, status string"
    ).withColumn("updated", F.current_timestamp()), metrics_path)

    svc = GraphouseService(spark, data_path, metrics_path, lazy_tree=True)
    # no load_tree() call anywhere:
    assert svc.search("one_min.srv1.*") == "one_min.srv1.cpu"
    assert svc.search("one_min.srv2.*") == ""  # HIDDEN invisible
    out = svc.metric_data(["one_min.srv1.cpu"], base, base + 180, now_seconds=base + 180)
    assert out["one_min.srv1.cpu"]["points"] == [1.0, 2.0, 3.0]
