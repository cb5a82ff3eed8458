"""Wire-parity e2e for the reference's SECOND consumer: the
graphite-api (non-django) plugin (src/main/pySources/graphouse_api.py)
drives this engine's HTTP server unmodified.

Same posture as test_plugin_parity.py (the graphite-web flavor): the
plugin imports structlog + graphite_api, which aren't in this
environment, so the fixture installs minimal stand-ins for exactly the
names it touches; the plugin module itself is loaded verbatim from the
reference tree — nothing is copied — and the test skips cleanly when
the reference checkout is absent.

Contract differences from the web flavor this test pins:
- GraphouseFinder takes a graphite-api CONFIG DICT
  (``config['graphouse']['url']``), not django settings;
- find_nodes POSTs /search per query (no worker pool, no find_multi);
- GraphouseReader.fetch returns a FLAT (time_infos, points) pair —
  tuples concatenated per node via ``+=`` (graphouse_api.py:100-109)
  — with the (0, 0, 1)/[] fallback for paths missing from the
  /metricData response.
"""

import importlib.util
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

PLUGIN_PATH = "/root/reference/src/main/pySources/graphouse_api.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PLUGIN_PATH),
    reason="reference plugin checkout not available")

BASE = 1_542_199_500  # multiple of 60


def _install_stubs() -> dict:
    """sys.modules stand-ins for structlog + graphite_api. Returns the
    saved entries for restore."""
    saved = {name: sys.modules.get(name) for name in (
        "structlog", "graphite_api", "graphite_api.intervals",
        "graphite_api.node")}

    structlog = types.ModuleType("structlog")

    class _Log:
        def info(self, *a, **k): pass
        def debug(self, *a, **k): pass
        def warning(self, *a, **k): pass

    structlog.get_logger = lambda *a, **k: _Log()

    intervals = types.ModuleType("graphite_api.intervals")

    class Interval:
        def __init__(self, start, end):
            self.start, self.end = start, end

    class IntervalSet(list):
        pass

    intervals.Interval, intervals.IntervalSet = Interval, IntervalSet

    node = types.ModuleType("graphite_api.node")

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

    graphite_api = types.ModuleType("graphite_api")
    graphite_api.intervals = intervals
    graphite_api.node = node

    sys.modules.update({
        "structlog": structlog,
        "graphite_api": graphite_api,
        "graphite_api.intervals": intervals,
        "graphite_api.node": node,
    })
    return saved


def _restore(saved: dict) -> None:
    for name, mod in saved.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
    sys.modules.pop("graphouse_reference_api_plugin", None)


def _load_plugin():
    spec = importlib.util.spec_from_file_location(
        "graphouse_reference_api_plugin", PLUGIN_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["graphouse_reference_api_plugin"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_reference_api_plugin_find_and_fetch(spark, tmp_path):
    pytest.importorskip("requests")
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = [
        # the MetricDataRowCallbackHandlerTest scenario over live HTTP
        f"one_min.ap.name1 33.33 {BASE}",
        f"one_min.ap.name1 42.0 {BASE + 60}",
        f"one_min.ap.name2 32.0 {BASE + 60}",
        f"one_min.ap.name2 77.7 {BASE + 120}",
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

    saved = _install_stubs()
    try:
        plugin = _load_plugin()
        finder = plugin.GraphouseFinder({"graphouse": {"url": url}})

        # default-url path of the config contract too
        assert plugin.GraphouseFinder({}).graphouse_url == \
            "http://localhost:2005"

        class _Q:
            pattern = "one_min.ap.*"

        nodes = list(finder.find_nodes(_Q()))
        leaves = sorted((n for n in nodes if n.is_leaf),
                        key=lambda n: n.path)
        assert [n.path for n in leaves] == ["one_min.ap.name1",
                                            "one_min.ap.name2"]

        # branch query: trailing dot stripped into BranchNode
        class _QB:
            pattern = "one_min.*"

        branches = [n for n in finder.find_nodes(_QB()) if not n.is_leaf]
        assert any(b.path == "one_min.ap" for b in branches)

        # get_intervals: the whole-history hint
        iv = leaves[0].reader.get_intervals()
        assert iv[0].start == 0 and iv[0].end > BASE

        # single-node fetch: flat (time_info, points)
        start, end = BASE, BASE + 180
        time_info, points = leaves[0].reader.fetch(start, end)
        assert list(time_info) == [start, end, 60]
        assert points == [33.33, 42.0, None]

        # multi-node fetch (graphite-api hands the reader a node list)
        multi = plugin.GraphouseReader([n for n in leaves],
                                       graphouse_url=url)
        time_infos, pts = multi.fetch(start, end)
        assert list(time_infos) == [start, end, 60, start, end, 60]
        assert pts == [33.33, 42.0, None, None, 32.0, 77.7]

        # path missing from the response -> the (0, 0, 1)/[] fallback
        ghost = types.SimpleNamespace(path="one_min.ap.ghost")
        mixed = plugin.GraphouseReader([leaves[0], ghost],
                                       graphouse_url=url)
        time_infos, pts = mixed.fetch(start, end)
        assert list(time_infos) == [start, end, 60, 0, 0, 1]
        assert pts == [33.33, 42.0, None]

        # engine-native render agrees with what the plugin received
        native = svc.metric_data(["one_min.ap.name1", "one_min.ap.name2"],
                                 start, end)
        assert native["one_min.ap.name1"]["points"] == [33.33, 42.0, None]
        assert native["one_min.ap.name2"]["points"] == [None, 32.0, 77.7]
    finally:
        _restore(saved)
        server.shutdown()
