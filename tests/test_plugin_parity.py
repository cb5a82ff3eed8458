"""Wire-parity e2e: the reference's OWN graphite-web plugin
(src/main/pySources/graphouse.py — the public consumer spec for
/search and /metricData) drives this engine's HTTP server unmodified.

The plugin imports django + graphite-web, which aren't in this
environment; the fixture installs minimal stand-ins for exactly the
names the plugin touches (settings attributes, LeafNode/BranchNode,
the worker-pool Job protocol, the logger). The plugin module itself is
loaded verbatim from the reference tree — nothing is copied — and the
test skips cleanly when the reference checkout is absent.

Scenario = MetricDataRowCallbackHandlerTest.java:23-133 re-staged over
live HTTP: two metrics interleaved on a 60 s grid, missing buckets
null, plus the requested-but-empty metric that must come back as an
all-null series (testEmptyMetricFilling)."""

import importlib.util
import json
import os
import sys
import types

import pytest
from pyspark.sql import functions as F

from graphouse_spark.api.http import start_http_server
from graphouse_spark.api.service import GraphouseService
from graphouse_spark.retention import (
    CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

PLUGIN_PATH = "/root/reference/src/main/pySources/graphouse.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PLUGIN_PATH),
    reason="reference plugin checkout not available")

BASE = 1_542_199_500  # multiple of 60


def _install_stubs(graphouse_url: str) -> dict:
    """sys.modules stand-ins for the plugin's django/graphite imports.
    Returns the saved entries for restore."""
    saved = {name: sys.modules.get(name) for name in (
        "django", "django.conf", "graphite", "graphite.intervals",
        "graphite.logger", "graphite.node", "graphite.worker_pool",
        "graphite.worker_pool.pool", "graphite.finders",
        "graphite.finders.utils", "graphite.storage")}

    settings = types.SimpleNamespace(
        GRAPHOUSE_URL=graphouse_url, WEBAPP_VERSION="1.1.8",
        USE_WORKER_POOL=False, POOL_MAX_WORKERS=10)
    django = types.ModuleType("django")
    django_conf = types.ModuleType("django.conf")
    django_conf.settings = settings
    django.conf = django_conf

    graphite = types.ModuleType("graphite")
    intervals = types.ModuleType("graphite.intervals")

    class Interval:
        def __init__(self, start, end):
            self.start, self.end = start, end

    class IntervalSet(list):
        pass

    intervals.Interval, intervals.IntervalSet = Interval, IntervalSet

    logger = types.ModuleType("graphite.logger")

    class _Log:
        def debug(self, *a, **k): pass
        def info(self, *a, **k): pass
        def warning(self, *a, **k): pass

    logger.log = _Log()

    node = types.ModuleType("graphite.node")

    class Node:
        def __init__(self, path):
            self.path = path

    class BranchNode(Node):
        is_leaf = False

    class LeafNode(Node):
        is_leaf = True

        def __init__(self, path, reader):
            super().__init__(path)
            self.reader = reader

    node.BranchNode, node.LeafNode = BranchNode, LeafNode

    pool_mod = types.ModuleType("graphite.worker_pool.pool")

    class Job:
        def __init__(self, fn, description, *args):
            self.fn, self.description, self.args = fn, description, args

    def get_pool(name, thread_count):  # noqa: ARG001
        return None

    def pool_exec(pool, jobs, timeout):  # noqa: ARG001
        return [j.fn(*j.args) for j in jobs]

    pool_mod.Job, pool_mod.get_pool, pool_mod.pool_exec = (
        Job, get_pool, pool_exec)
    worker_pool = types.ModuleType("graphite.worker_pool")
    worker_pool.pool = pool_mod

    finders_utils = types.ModuleType("graphite.finders.utils")

    class BaseFinder:
        def __init__(self):
            pass

        # graphite 1.1's Store.wait_jobs runs jobs on a pool and
        # yields results; serial execution keeps the test deterministic
        def wait_jobs(self, jobs, timeout, description):  # noqa: ARG002
            return [j.fn(*j.args) for j in jobs]

    finders_utils.BaseFinder = BaseFinder
    finders = types.ModuleType("graphite.finders")
    finders.utils = finders_utils

    storage = types.ModuleType("graphite.storage")

    class Store:
        pass

    storage.Store = Store

    sys.modules.update({
        "django": django, "django.conf": django_conf,
        "graphite": graphite, "graphite.intervals": intervals,
        "graphite.logger": logger, "graphite.node": node,
        "graphite.worker_pool": worker_pool,
        "graphite.worker_pool.pool": pool_mod,
        "graphite.finders": finders,
        "graphite.finders.utils": finders_utils,
        "graphite.storage": storage,
    })
    return saved


def _restore(saved: dict) -> None:
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
    sys.modules.pop("graphouse_reference_plugin", None)


def _load_plugin():
    spec = importlib.util.spec_from_file_location(
        "graphouse_reference_plugin", PLUGIN_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["graphouse_reference_plugin"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_reference_plugin_find_and_fetch(spark, tmp_path):
    pytest.importorskip("requests")
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = [
        # name1: points in the first two grid slots (testHandler)
        f"one_min.pp.name1 33.33 {BASE}",
        f"one_min.pp.name1 42.0 {BASE + 60}",
        # name2: slots 2 and 3
        f"one_min.pp.name2 32.0 {BASE + 60}",
        f"one_min.pp.name2 77.7 {BASE + 120}",
        # name3: only a point far outside the window — the
        # testEmptyMetricFilling scenario (found, but all-null)
        f"one_min.pp.name3 1.0 {BASE + 86400}",
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, provider)
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"

    saved = _install_stubs(url)
    try:
        plugin = _load_plugin()
        finder = plugin.GraphouseFinder()

        # find_multi: glob -> leaf nodes (dirs excluded), graphite 1.1's
        # find path (graphouse.py:227-248)
        class _Q:
            pattern = "one_min.pp.*"

        found = list(finder.find_multi(["one_min.pp.*"]))
        assert len(found) == 1 and found[0][0] == "one_min.pp.*"
        leaf_paths = sorted(n.path for n in found[0][1])
        assert leaf_paths == ["one_min.pp.name1", "one_min.pp.name2",
                              "one_min.pp.name3"]
        assert all(n.is_leaf for n in found[0][1])

        # the 1.0 path too: find_nodes yields branches with trailing
        # dot stripped (graphouse.py:203-225)
        nodes = list(finder.find_nodes(_Q()))
        assert sorted(n.path for n in nodes if n.is_leaf) == leaf_paths

        # fetch: the full multifetch path (graphouse.py:271-380) —
        # find_multi + POST /metricData + per-node (time_info, values)
        start, end = BASE, BASE + 180
        results = finder.fetch(["one_min.pp.*"], start, end)
        got = {r["path"]: (r["time_info"], r["values"]) for r in results}
        assert set(got) == set(leaf_paths)
        for r in results:
            assert r["pathExpression"] == "one_min.pp.*"
            assert r["name"] == r["path"]

        # MetricDataRowCallbackHandlerTest.testHandler values on the
        # 60 s grid; missing buckets are None
        assert got["one_min.pp.name1"] == ((start, end, 60),
                                           [33.33, 42.0, None])
        assert got["one_min.pp.name2"] == ((start, end, 60),
                                           [None, 32.0, 77.7])
        # testEmptyMetricFilling: found-but-empty metric = all-null
        # series on the same grid (NOT the ((start,end,1),[]) fallback
        # the plugin uses for paths missing from the response)
        assert got["one_min.pp.name3"] == ((start, end, 60),
                                           [None, None, None])

        # engine-native render agrees with what the plugin received
        native = svc.metric_data(leaf_paths, start, end)
        for path in leaf_paths:
            m = native[path]
            assert (m["start"], m["end"], m["step"]) == got[path][0]
            assert m["points"] == got[path][1]
    finally:
        _restore(saved)
        server.shutdown()


@pytest.mark.slow
def test_metricdata_wire_bytes_match_reference_handler(spark, tmp_path):
    """Byte-level golden: the /metricData HTTP response for the
    testHandler scenario equals the exact string Gson's JsonWriter
    produced in MetricDataRowCallbackHandlerTest.java:23-58 (compact
    separators, insertion-ordered keys, nulls for missing buckets)."""
    requests = pytest.importorskip("requests")
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = [
        f"one_min.wb.name1 33.33 {BASE}",
        f"one_min.wb.name1 42.0 {BASE + 60}",
        f"one_min.wb.name2 32.0 {BASE + 60}",
        f"one_min.wb.name2 77.7 {BASE + 120}",
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, provider)
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]
    try:
        resp = requests.post(
            f"http://127.0.0.1:{port}/metricData",
            params={"start": BASE, "end": BASE + 180, "reqKey": "golden"},
            data={"metrics": "one_min.wb.name1,one_min.wb.name2"})
        resp.raise_for_status()
        s, e = BASE, BASE + 180
        expected = (
            '{"one_min.wb.name1":{"start":%d,"end":%d,"step":60,'
            '"points":[33.33,42.0,null]},'
            '"one_min.wb.name2":{"start":%d,"end":%d,"step":60,'
            '"points":[null,32.0,77.7]}}' % (s, e, s, e))
        assert resp.text == expected
        assert json.loads(resp.text)  # and it is valid JSON
    finally:
        server.shutdown()
