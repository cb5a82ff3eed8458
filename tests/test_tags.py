"""Graphite tagged-series extension: parse/canonical twins, tag-map
column, seriesByTag operator semantics (graphite-web tags/base.py),
and the sargable name= prefix range."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark import tags as T


# ------------------------------------------------------------- parsing

def test_parse_tagged_basic():
    path, tg = T.parse_tagged("disk.used;datacenter=dc1;rack=a2")
    assert path == "disk.used"
    assert tg == {"name": "disk.used", "datacenter": "dc1", "rack": "a2"}


def test_parse_untagged_has_only_name():
    assert T.parse_tagged("a.b.c") == ("a.b.c", {"name": "a.b.c"})


def test_parse_rejects_malformed():
    with pytest.raises(ValueError):
        T.parse_tagged("a.b;novalue")
    with pytest.raises(ValueError):
        T.parse_tagged("a.b;=v")
    with pytest.raises(ValueError):
        T.parse_tagged("a.b;k=")


def test_canonical_sorts_tags():
    assert T.canonical("m;z=1;a=2") == "m;a=2;z=1"
    assert T.canonical("m;a=2;z=1") == "m;a=2;z=1"
    assert T.canonical("plain.name") == "plain.name"
    # value may contain '=' (split on first only)
    assert T.parse_tagged("m;k=a=b")[1]["k"] == "a=b"


def test_canonical_col_matches_python(spark):
    names = ["m;z=1;a=2", "m;a=2;z=1", "plain.name", "x.y;k=v"]
    df = spark.createDataFrame([(n,) for n in names], "metric string")
    got = [r[0] for r in
           df.select(T.canonical_col(F.col("metric"))).collect()]
    assert got == [T.canonical(n) for n in names]


def test_tags_map_col_matches_python(spark):
    names = ["disk.used;datacenter=dc1;rack=a2", "plain.name"]
    df = spark.createDataFrame([(n,) for n in names], "metric string")
    got = [r[0] for r in
           df.select(T.tags_map_col(F.col("metric"))).collect()]
    assert got == [T.parse_tagged(n)[1] for n in names]


# --------------------------------------------------------- seriesByTag

@pytest.fixture()
def tagged(spark):
    rows = []
    for dc in ("dc1", "dc2"):
        for rack in ("a1", "b2"):
            for t in (0, 60):
                rows.append((f"disk.used;datacenter={dc};rack={rack}",
                             t, 10.0))
    rows += [("disk.used", 0, 1.0), ("disk.total;datacenter=dc1", 0, 99.0)]
    return spark.createDataFrame(rows, "metric string, ts long, value double")


def _names(df):
    return {r["metric"] for r in df.select("metric").distinct().collect()}


def test_series_by_tag_equality(tagged):
    got = T.series_by_tag(tagged, ["name=disk.used", "datacenter=dc1"])
    assert _names(got) == {"disk.used;datacenter=dc1;rack=a1",
                           "disk.used;datacenter=dc1;rack=b2"}


def test_series_by_tag_not_equal_and_missing(tagged):
    # != matches series missing the tag too (graphite tags/base.py)
    got = T.series_by_tag(tagged, ["name=disk.used", "datacenter!=dc1"])
    assert _names(got) == {"disk.used;datacenter=dc2;rack=a1",
                           "disk.used;datacenter=dc2;rack=b2",
                           "disk.used"}
    # key= with empty value selects series WITHOUT the tag
    got = T.series_by_tag(tagged, ["name=disk.used", "datacenter="])
    assert _names(got) == {"disk.used"}
    # key!= with empty value selects series WITH the tag
    got = T.series_by_tag(tagged, ["name=disk.used", "datacenter!="])
    assert len(_names(got)) == 4


def test_series_by_tag_regex(tagged):
    got = T.series_by_tag(tagged, ["name=disk.used", "rack=~a.*"])
    assert _names(got) == {"disk.used;datacenter=dc1;rack=a1",
                           "disk.used;datacenter=dc2;rack=a1"}
    # anchored at start, as re.match: '. *2' must not match 'a1'
    got = T.series_by_tag(tagged, ["name=disk.used", "rack=~.2"])
    assert _names(got) == {"disk.used;datacenter=dc1;rack=b2",
                           "disk.used;datacenter=dc2;rack=b2"}
    got = T.series_by_tag(tagged, ["name=disk.used", "rack!=~a.*"])
    # negated regex keeps series missing the tag
    assert "disk.used" in _names(got)
    assert "disk.used;datacenter=dc1;rack=b2" in _names(got)


def test_series_by_tag_name_regex(tagged):
    got = T.series_by_tag(tagged, ["name=~disk\\..*", "datacenter=dc1"])
    assert "disk.total;datacenter=dc1" in _names(got)


def test_series_by_tag_prefix_range_is_pushed(tagged):
    # the name= term becomes a sargable startswith/equality — visible
    # as a pushed data filter in the physical plan
    got = T.series_by_tag(tagged, ["name=disk.used", "datacenter=dc1"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "disk.used" in plan  # literal reached the plan, not a UDF


def test_series_by_tag_rejects_empty_and_malformed(tagged):
    with pytest.raises(ValueError):
        T.series_by_tag(tagged, [])
    with pytest.raises(ValueError):
        T.compile_term("nonsense", T.tags_map_col(F.col("metric")))


def test_name_equals_term():
    assert T.name_equals_term(["rack=a1", "name=disk.used"]) == "disk.used"
    assert T.name_equals_term(["name=~disk.*"]) is None
    assert T.name_equals_term(["rack=a1"]) is None


# -------------------------------------------- render-function surface

def test_series_by_tag_target(tagged):
    from graphouse_spark.functions.target import evaluate_target

    got = evaluate_target(
        tagged, "seriesByTag('name=disk.used', 'datacenter=dc1')")
    assert _names(got) == {"disk.used;datacenter=dc1;rack=a1",
                           "disk.used;datacenter=dc1;rack=b2"}


def test_alias_by_tags_target(tagged):
    from graphouse_spark.functions.target import evaluate_target

    got = evaluate_target(
        tagged,
        "aliasByTags(seriesByTag('name=disk.used', 'datacenter=dc1'), "
        "'rack', 'datacenter')")
    assert _names(got) == {"a1.dc1", "b2.dc1"}
    # missing tags drop out of the join
    got = evaluate_target(
        tagged, "aliasByTags(seriesByTag('name=disk.used', 'datacenter='), "
        "'rack', 'name')")
    assert _names(got) == {"disk.used"}


def test_group_by_tags_target(tagged):
    from graphouse_spark.functions.target import evaluate_target

    got = evaluate_target(
        tagged,
        "groupByTags(seriesByTag('name=disk.used', 'datacenter!='), "
        "'sum', 'name', 'datacenter')")
    by = {(r["metric"], r["ts"]): r["value"] for r in got.collect()}
    # two racks of 10.0 summed per datacenter per ts
    assert by[("disk.used;datacenter=dc1", 0)] == 20.0
    assert by[("disk.used;datacenter=dc2", 60)] == 20.0
    # name aggregated away -> callback names the series
    got = evaluate_target(
        tagged,
        "groupByTags(seriesByTag('name=disk.used', 'datacenter!='), "
        "'avg', 'rack')")
    by = {(r["metric"], r["ts"]): r["value"] for r in got.collect()}
    assert by[("avg;rack=a1", 0)] == 10.0


def test_tag_targets_compose_with_untagged_functions(tagged):
    from graphouse_spark.functions.target import evaluate_target

    got = evaluate_target(
        tagged,
        "sumSeries(seriesByTag('name=disk.used', 'datacenter=dc1'))")
    by = {r["ts"]: r["value"] for r in got.collect()}
    assert by[0] == 20.0 and by[60] == 20.0


# ------------------------------------------------- ingest + /render e2e

def test_tagged_ingest_and_render_e2e(spark, tmp_path):
    """Tagged plaintext lines ingest into the data table (canonical tag
    order), stay OUT of the metric tree, and serve through the real
    /render path via seriesByTag — resolved against the data table with
    the name= prefix range."""
    import json
    import urllib.parse
    import urllib.request

    from pyspark.sql import functions as F

    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.retention import (
        CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = 1_542_199_500
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = []
    for dc, v in (("dc1", 10.0), ("dc2", 20.0)):
        for i in (0, 1):
            # tags deliberately unsorted: rack before datacenter
            lines.append(f"disk.used;rack=r9;datacenter={dc} {v} {BASE + i*60}")
    lines.append(f"plain.srv.cpu 1.0 {BASE}")
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)

    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, provider)
    svc.load_tree()
    # tree holds only the untagged name's chain — no ';' anywhere
    assert svc.search("*") == "disk.\nplain.\n" or ";" not in svc.search("*")

    server = start_http_server(svc)
    port = server.server_address[1]
    try:
        t = urllib.parse.quote(
            "seriesByTag('name=disk.used', 'datacenter=dc1')")
        u = (f"http://127.0.0.1:{port}/render?target={t}"
             f"&from={BASE - 10}&until={BASE + 190}&format=json")
        body = json.loads(urllib.request.urlopen(u).read().decode())
        # canonical order on ingest: datacenter sorts before rack
        assert [s["target"] for s in body] == \
            ["disk.used;datacenter=dc1;rack=r9"]
        vals = [p[0] for p in body[0]["datapoints"] if p[0] is not None]
        assert vals == [10.0, 10.0]

        t = urllib.parse.quote(
            "groupByTags(seriesByTag('name=disk.used', 'datacenter!='), "
            "'sum', 'name')")
        u = (f"http://127.0.0.1:{port}/render?target={t}"
             f"&from={BASE - 10}&until={BASE + 190}&format=json")
        body = json.loads(urllib.request.urlopen(u).read().decode())
        assert [s["target"] for s in body] == ["disk.used"]
        vals = [p[0] for p in body[0]["datapoints"] if p[0] is not None]
        assert vals == [30.0, 30.0]

        # no name= equality term -> bounded refusal, not a full scan
        t = urllib.parse.quote("seriesByTag('datacenter=dc1')")
        u = (f"http://127.0.0.1:{port}/render?target={t}"
             f"&from={BASE - 10}&until={BASE + 190}&format=json")
        try:
            urllib.request.urlopen(u)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code in (400, 413)
        assert raised
    finally:
        server.shutdown()


def test_tags_http_api(spark, tmp_path):
    """graphite-web /tags API (grafana's tag browser): findSeries,
    autoComplete/tags, autoComplete/values — served from the tagged
    namespace inside the date-partition lookback window."""
    import json
    import urllib.parse
    import urllib.request

    from pyspark.sql import functions as F

    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    import time as _time
    BASE = int(_time.time()) - 3600  # inside the 7-day lookback window
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = [
        f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",
        f"disk.used;datacenter=dc2;rack=b2 2.0 {BASE}",
        f"cpu.load;datacenter=dc1 3.0 {BASE}",
        f"plain.srv.cpu 4.0 {BASE}",
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path)
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]

    def get(path, **params):
        pairs = []
        for k, v in params.items():
            for item in (v if isinstance(v, list) else [v]):
                pairs.append((k, item))
        u = (f"http://127.0.0.1:{port}{path}?"
             + urllib.parse.urlencode(pairs))
        return json.loads(urllib.request.urlopen(u).read().decode())

    try:
        assert get("/tags/findSeries", expr="name=disk.used") == [
            "disk.used;datacenter=dc1;rack=a1",
            "disk.used;datacenter=dc2;rack=b2"]
        assert get("/tags/findSeries",
                   expr=["name=disk.used", "datacenter=dc2"]) == [
            "disk.used;datacenter=dc2;rack=b2"]
        # tag-key autocomplete: name excluded, prefix filter applies
        assert get("/tags/autoComplete/tags") == ["datacenter", "rack"]
        assert get("/tags/autoComplete/tags", tagPrefix="ra") == ["rack"]
        assert get("/tags/autoComplete/tags",
                   expr="name=cpu.load") == ["datacenter"]
        # value autocomplete, optionally narrowed by exprs and prefix
        assert get("/tags/autoComplete/values",
                   tag="datacenter") == ["dc1", "dc2"]
        assert get("/tags/autoComplete/values", tag="datacenter",
                   expr="name=cpu.load") == ["dc1"]
        assert get("/tags/autoComplete/values", tag="rack",
                   valuePrefix="b") == ["b2"]
        assert get("/tags/autoComplete/values", tag="rack", limit=1) == ["a1"]
        # missing expr on findSeries -> 400
        try:
            get("/tags/findSeries")
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
        assert raised
    finally:
        server.shutdown()


# -------------------------------------------- hardening (review round)

def test_parse_rejects_duplicate_and_name_tags():
    with pytest.raises(ValueError, match="duplicate"):
        T.parse_tagged("a.b;x=1;x=2")
    with pytest.raises(ValueError, match="duplicate"):
        T.parse_tagged("cpu.load;name=evil")


def test_tags_map_col_is_total_on_hostile_names(spark):
    # pre-existing/foreign rows with dup keys or explicit name= must
    # not throw at READ time (DUPLICATED_MAP_KEY would poison every
    # /tags query touching the row): first occurrence wins, explicit
    # name= is ignored
    names = ["a.b;x=1;x=2", "cpu.load;name=evil;dc=1", "ok.m;k=v"]
    df = spark.createDataFrame([(n,) for n in names], "metric string")
    got = [r[0] for r in df.select(
        T.tags_map_col(F.col("metric"))).collect()]
    assert got[0] == {"name": "a.b", "x": "1"}
    assert got[1] == {"name": "cpu.load", "dc": "1"}
    assert got[2] == {"name": "ok.m", "k": "v"}


def test_exploded_tag_rows_matches_map_explode(spark):
    """r14 optimization: the codegen posexplode form must be
    row-identical to explode(tags_map_col(...)) on every hostile shape
    the map form handles — duplicate keys (first wins), explicit name=
    (dropped), '=' inside values, empty keys/values, pairs without '=',
    untagged names (only the name row) including ones containing '=',
    and NULL names (('name', NULL))."""
    names = [
        "a.b;x=1;x=2",                 # dup key: first wins
        "cpu.load;name=evil;dc=1",     # explicit name= dropped
        "ok.m;k=v",
        "m;k=a=b;j==x",                # '=' in value, empty key
        "m2;k=;=v;noeq;k2=v2",         # empty value, empty key, no '='
        "plain.name",                  # untagged
        "odd=name.no.semicolon",       # untagged but contains '='
        "u;host=h;rack=r;dc=d;host=h2",
        None,                          # NULL name
    ]
    df = spark.createDataFrame([(n, 123) for n in names],
                               "metric string, extra int")
    old = df.select(
        F.col("metric"),
        F.explode(T.tags_map_col(F.col("metric"))).alias("tag", "value"),
        "extra")
    new = T.exploded_tag_rows(df, "metric", ["extra"])
    assert sorted(map(tuple, new.collect()), key=repr) == \
        sorted(map(tuple, old.collect()), key=repr)


def test_canonical_col_sorts_by_key_not_pair_string(spark):
    # '-' < '=' so whole-string sort would put dc-x=1 before dc=2;
    # graphite sorts by KEY: dc < dc-x
    df = spark.createDataFrame([("m.x;dc-x=1;dc=2",)], "metric string")
    got = df.select(T.canonical_col(F.col("metric"))).first()[0]
    assert got == "m.x;dc=2;dc-x=1" == T.canonical("m.x;dc-x=1;dc=2")


def test_tagged_ingest_filters_hostile_and_short_plain_lines(spark):
    rows = [
        "cpu;host=h1 1.0 1000",          # short tagged path: OK
        "a.b;x=1;x=2 1.0 1000",          # dup key: dropped
        "c.d;name=evil 1.0 1000",        # explicit name=: dropped
        "localhost 1.0 1000",            # short plain name: dropped
        "one_min.srv.cpu 1.0 1000",      # reference-valid plain: OK
    ]
    raw = spark.createDataFrame([(l,) for l in rows], "value string")
    got = sorted(r["name"] for r in
                 T.parse_tagged_lines(raw, updated=F.lit(1)).collect())
    assert got == ["cpu;host=h1", "one_min.srv.cpu"]


def test_series_by_tag_bad_regex_is_value_error(tagged):
    with pytest.raises(ValueError, match="bad regex"):
        T.series_by_tag(tagged, ["name=disk.used", "rack=~["])


def test_tagged_regexp_rejects_leading_tilde_value(spark):
    """graphite forbids a '~' at the START of a tag value (it would be
    ambiguous against graphite's own '~' spellings); mid-value '~' is
    fine. Regression for the round-7 advisory on TAGGED_METRIC_REGEXP."""
    import re

    ok = ["cpu.load;host=h1", "cpu;path=a~b", "a.b;k=v;k2=v2"]
    bad = ["cpu;host=~h1", "cpu;host=~", "a.b;k=v;k2=~x"]
    for name in ok:
        assert re.match(T.TAGGED_METRIC_REGEXP, name), name
    for name in bad:
        assert re.match(T.TAGGED_METRIC_REGEXP, name) is None, name
    # and end-to-end through the tagged ingest parse
    rows = [("cpu;host=~h1 1.0 1000",), ("cpu;host=h1 1.0 1000",)]
    raw = spark.createDataFrame(rows, "value string")
    got = [r["name"] for r in
           T.parse_tagged_lines(raw, updated=F.lit(1)).collect()]
    assert got == ["cpu;host=h1"]


def test_tag_find_series_honors_explicit_zero_limit(spark, tmp_path):
    """`limit=0` must return zero rows, not fall back to the 10k
    default (round-7 advisory: `limit or 10000`)."""
    import json
    import time as _time

    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = int(_time.time()) - 3600
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    raw = spark.createDataFrame(
        [(f"disk.used;dc=dc1 1.0 {BASE}",), (f"disk.used;dc=dc2 2.0 {BASE}",)],
        "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path)
    assert json.loads(svc.tag_find_series(["name=disk.used"])) == [
        "disk.used;dc=dc1", "disk.used;dc=dc2"]
    assert json.loads(svc.tag_find_series(["name=disk.used"], limit=1)) == [
        "disk.used;dc=dc1"]
    assert json.loads(svc.tag_find_series(["name=disk.used"], limit=0)) == []


def test_tag_index_written_on_ingest(spark, tmp_path):
    """With IngestConfig.tags_path set, each batch appends one
    (metric, tag, value, date) row per tag of each tagged series —
    including the implicit name tag — and nothing for untagged names.
    Re-appending the same batch (crash replay) stays distinct-safe."""
    from pyspark.sql import functions as F

    from graphouse_spark.sources.tables import read_tags
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = 1_542_199_500
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    lines = [
        f"disk.used;rack=r9;datacenter=dc1 1.0 {BASE}",
        f"plain.srv.cpu 4.0 {BASE}",
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    batch = T.parse_tagged_lines(raw, updated=F.lit(BASE))
    ingest_batch(batch, cfg, known_names=None)

    idx = read_tags(spark, cfg.tags_path)
    rows = {(r["metric"], r["tag"], r["value"])
            for r in idx.collect()}
    canon = "disk.used;datacenter=dc1;rack=r9"
    assert rows == {
        (canon, "name", "disk.used"),
        (canon, "datacenter", "dc1"),
        (canon, "rack", "r9"),
    }
    # at-least-once replay: same rows again; distinct view unchanged
    ingest_batch(batch, cfg, known_names=None)
    idx2 = read_tags(spark, cfg.tags_path)
    assert idx2.count() == 6
    assert idx2.distinct().count() == 3


def test_tags_api_serves_from_index_same_answers(spark, tmp_path):
    """The /tags family and render-path seriesByTag return the SAME
    answers with the persisted index as without — and with the index,
    browsing never scans the points table (plan check)."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.retention import (
        CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = int(_time.time()) - 3600  # inside the lookback window
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    lines = [
        f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",
        f"disk.used;datacenter=dc2;rack=b2 2.0 {BASE}",
        f"cpu.load;datacenter=dc1 3.0 {BASE}",
        f"plain.srv.cpu 4.0 {BASE}",
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)

    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    with_idx = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                                provider, tags_path=cfg.tags_path)
    without = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                               provider)
    for svc in (with_idx, without):
        svc.load_tree()

    # identical answers across the whole browse surface
    for call in [
        lambda s: s.tag_find_series(["name=disk.used"]),
        lambda s: s.tag_find_series(["name=disk.used", "datacenter=dc2"]),
        lambda s: s.tag_find_series(["datacenter=dc1"]),
        lambda s: s.tag_autocomplete_tags(),
        lambda s: s.tag_autocomplete_tags(exprs=["datacenter=dc1"]),
        lambda s: s.tag_autocomplete_tags(tag_prefix="ra"),
        lambda s: s.tag_autocomplete_values("datacenter"),
        lambda s: s.tag_autocomplete_values("rack", value_prefix="b"),
        lambda s: s.tag_autocomplete_values("rack",
                                            exprs=["datacenter=dc2"]),
        # regex-only term sets: the index side takes the sub-index
        # prune path, the no-index side the full map compile
        lambda s: s.tag_find_series(["datacenter=~dc.*"]),
        lambda s: s.tag_find_series(["rack=~[ab].*", "datacenter!=dc3"]),
        lambda s: s.tag_find_series(["rack!=~a.*", "datacenter=~dc.*"]),
        lambda s: s.tag_autocomplete_values("rack",
                                            exprs=["datacenter=~dc1"]),
        lambda s: s.tag_autocomplete_tags(exprs=["name=~disk\\..*"]),
    ]:
        assert _json.loads(call(with_idx)) == _json.loads(call(without))

    # render resolution equal too
    target = "seriesByTag('name=disk.used', 'datacenter=dc1')"
    a = with_idx.render(target, BASE - 10, BASE + 70)
    b = without.render(target, BASE - 10, BASE + 70)
    assert [s["target"] for s in a] == [s["target"] for s in b] == [
        "disk.used;datacenter=dc1;rack=a1"]

    # plan check: index-backed browsing reads the tag index files, not
    # the points table
    plan = with_idx._tagged_names(["datacenter=dc1"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "tags" in plan and "/data" not in plan


def test_tag_index_pushes_equality_into_scan(spark, tmp_path):
    """A positive tag=value term prunes the index scan (sargable
    filter on the sorted (tag, value, metric) layout) before any tag
    map is compiled."""
    from pyspark.sql import functions as F

    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    import time as _time
    BASE = int(_time.time()) - 3600
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc{i % 3};rack=r{i} 1.0 {BASE}",)
         for i in range(30)], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           tags_path=cfg.tags_path)
    df = svc._tagged_names(["datacenter=dc1", "rack!=r1"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the (tag, value) equality reached the scan as a pushed filter
    assert "datacenter" in plan and "dc1" in plan
    got = sorted(r["metric"] for r in df.collect())
    assert got == sorted(
        f"disk.used;datacenter=dc1;rack=r{i}" for i in range(30)
        if i % 3 == 1 and i != 1)


def test_render_seriesbytag_without_name_term_uses_index(spark, tmp_path):
    """With a persisted index, a render-path seriesByTag with NO name=
    term resolves (bounded per-series index scan, graphite's tag-DB
    posture) instead of the 413 refusal; without one the refusal
    stays."""
    import time as _time

    from pyspark.sql import functions as F

    from graphouse_spark.api.service import GraphouseService, QueryLimitExceeded
    from graphouse_spark.retention import (
        CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = int(_time.time()) - 3600
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",),
         (f"net.rx;datacenter=dc1 2.0 {BASE}",),
         (f"net.rx;datacenter=dc2 3.0 {BASE}",)], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    with_idx = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                                provider, tags_path=cfg.tags_path)
    without = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                               provider)
    for s in (with_idx, without):
        s.load_tree()

    target = "seriesByTag('datacenter=dc1')"
    out = with_idx.render(target, BASE - 10, BASE + 70)
    assert sorted(s["target"] for s in out) == [
        "disk.used;datacenter=dc1;rack=a1", "net.rx;datacenter=dc1"]
    with pytest.raises(QueryLimitExceeded):
        without.render(target, BASE - 10, BASE + 70)


def test_host_redirect_wired_through_stream_parse(spark):
    """IngestConfig.host_redirect (graphouse.host-metric-redirect.*)
    rewrites prefix.host<postfix>.rest at parse time, reference S4."""
    from pyspark.sql import functions as F

    from graphouse_spark.streaming.ingest import IngestConfig, _parse_stream

    cfg = IngestConfig("d", "m", "c",
                       host_redirect=(("_example_net", "hosts"),))
    raw = spark.createDataFrame(
        [("one_min.web1_example_net.cpu 1.0 1000",),
         ("one_min.plain.cpu 2.0 1000",)], "value string")
    parsed = _parse_stream(raw, cfg, updated=F.lit(1))
    names = sorted(r["name"] for r in parsed.collect())
    assert names == ["one_min.hosts.web1_example_net.cpu",
                     "one_min.plain.cpu"]


def test_redirect_exempts_tagged_names(spark):
    """The S4 host redirect must never fire off a TAG VALUE: a tagged
    name whose first tag value ends with the postfix is left alone
    (round-9 review finding), while the untagged form still rewrites."""
    from pyspark.sql import functions as F

    from graphouse_spark.streaming.ingest import IngestConfig, _parse_stream

    cfg = IngestConfig("d", "m", "c", allow_tags=True,
                       host_redirect=(("_example_net", "hosts"),))
    raw = spark.createDataFrame(
        [("cpu.load;host=web1_example_net 1.0 1000",),
         ("one_min.web1_example_net.cpu 2.0 1000",)], "value string")
    names = sorted(r["name"] for r in
                   _parse_stream(raw, cfg, updated=F.lit(1)).collect())
    assert names == ["cpu.load;host=web1_example_net",
                     "one_min.hosts.web1_example_net.cpu"]


def test_tagged_parse_honors_configured_validator(spark):
    """graphouse.metric-validation.* applies to the UNTAGGED namespace
    under --tagged-ingest too (round-9 review finding)."""
    from pyspark.sql import functions as F

    from graphouse_spark.config import settings_from_properties
    from graphouse_spark.streaming.ingest import IngestConfig, _parse_stream

    s = settings_from_properties(
        {"graphouse.metric-validation.min-levels": "4"})
    cfg = IngestConfig("d", "m", "c", allow_tags=True,
                       validator=s.validator())
    raw = spark.createDataFrame(
        [("one_min.a.b.c 1.0 1000",),      # 3 dots: rejected at minDots=4
         ("one_min.a.b.c.d 2.0 1000",),    # 4 dots: kept
         ("cpu;dc=1 3.0 1000",)],          # tagged namespace: kept
        "value string")
    names = sorted(r["name"] for r in
                   _parse_stream(raw, cfg, updated=F.lit(1)).collect())
    assert names == ["cpu;dc=1", "one_min.a.b.c.d"]


def test_serve_backfills_tag_index_from_existing_lake(spark, tmp_path):
    """A lake with tagged series ingested BEFORE the index existed must
    not lose them when serving switches to the index: serve backfills
    the index from the data table on boot (round-9 review finding)."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F

    from graphouse_spark.__main__ import build_parser, run_serve
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = int(_time.time()) - 3600
    # pre-index ingest: NO tags_path configured
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"), allow_tags=True)
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc9;rack=old1 1.0 {BASE}",)],
        "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)

    args = build_parser().parse_args([
        "serve", "--data", cfg.data_path, "--metrics", cfg.metrics_path,
        "--checkpoint", cfg.checkpoint_path,
        "--http-port", "0", "--graphite-port", "0", "--tagged-ingest"])
    svc, http, query = run_serve(args, spark=spark, block=False)
    try:
        import os
        assert os.path.exists(cfg.data_path.rstrip("/") + "_tags")
        # the pre-index series is visible through the index
        assert _json.loads(svc.tag_find_series(["datacenter=dc9"])) == [
            "disk.used;datacenter=dc9;rack=old1"]
        assert _json.loads(svc.tag_autocomplete_values("rack")) == ["old1"]
    finally:
        http.shutdown()


def test_tags_del_series_edits_index_only(spark, tmp_path):
    """graphite-web /tags/delSeries: the tag DB forgets the series
    (any tag ordering in the request), data points stay; POST e2e."""
    import json as _json
    import time as _time
    import urllib.parse
    import urllib.request

    from pyspark.sql import functions as F

    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.sources.tables import read_data
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = int(_time.time()) - 3600
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",),
         (f"disk.used;datacenter=dc2;rack=b2 2.0 {BASE}",)], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           tags_path=cfg.tags_path)
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]
    try:
        # POST with the tags UNSORTED: canonicalization must match
        body = urllib.parse.urlencode(
            [("path", "disk.used;rack=a1;datacenter=dc1")]).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tags/delSeries", data=body)
        with urllib.request.urlopen(req, timeout=60) as r:
            assert _json.loads(r.read().decode()) is True
        assert _json.loads(svc.tag_find_series(["name=disk.used"])) == [
            "disk.used;datacenter=dc2;rack=b2"]
        # data points untouched (delSeries edits the tag DB only)
        assert read_data(spark, cfg.data_path).count() == 2
        # deleting something unknown reports false, index unchanged
        assert _json.loads(svc.tag_del_series(["nope;x=1"])) is False
        assert _json.loads(svc.tag_find_series(["name=disk.used"])) == [
            "disk.used;datacenter=dc2;rack=b2"]
    finally:
        server.shutdown()


def test_rewrite_tags_atomic_carries_concurrent_appends(spark, tmp_path):
    """The stage->swap rewrite must not lose a file appended between
    the snapshot read and the swap (a live micro-batch): the appended
    rows survive the rewrite, leftover stage/bak dirs from a crashed
    attempt are cleaned, and failures leave the live dir untouched."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from graphouse_spark.sources.tables import (
        read_tags, rewrite_tags_atomic, write_tags)
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch
    from graphouse_spark.tags import tag_index_rows

    BASE = int(_time.time()) - 3600
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame(
        [(f"disk.used;dc=one 1.0 {BASE}",)], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    # leftover dirs from a "crashed" prior rewrite get cleaned
    parent = str(tmp_path)
    os.makedirs(os.path.join(parent, ".stage-tags-deadbeef"))
    os.makedirs(os.path.join(parent, ".bak-tags-deadbeef"))

    def transform_and_append(idx):
        # simulate a concurrent micro-batch landing DURING the rewrite
        late = spark.createDataFrame(
            [("net.rx;dc=two", BASE)], "name string, updated long")
        write_tags(tag_index_rows(late), cfg.tags_path)
        return idx  # keep everything from the snapshot

    n = rewrite_tags_atomic(spark, cfg.tags_path, transform_and_append)
    assert n == 2  # snapshot rows (name + dc tags of disk.used)
    after = {r["metric"] for r in read_tags(spark, cfg.tags_path).collect()}
    assert after == {"disk.used;dc=one", "net.rx;dc=two"}  # append kept
    assert not [d for d in os.listdir(parent)
                if d.startswith((".stage-tags", ".bak-tags"))]
    # the SUB-INDEX carry-over too: the concurrent append's
    # (tag, value) pairs must survive the values swap (superset
    # contract — else the appended series hides from =~ browses)
    from graphouse_spark.sources.tables import read_tag_values
    sub = {(r["tag"], r["value"])
           for r in read_tag_values(spark, cfg.tags_path).collect()}
    assert {("name", "net.rx"), ("dc", "two"),
            ("name", "disk.used"), ("dc", "one")} <= sub

    # a failing transform leaves the live index untouched
    import pytest as _pytest
    with _pytest.raises(Exception):
        rewrite_tags_atomic(spark, cfg.tags_path,
                            lambda idx: idx.selectExpr("boom()"))
    still = {r["metric"] for r in read_tags(spark, cfg.tags_path).collect()}
    assert still == after


def test_write_tags_appends_serialize_with_rewrite(spark, tmp_path):
    """Round-10 ADVICE (medium): the streaming thread's write_tags
    append races the delSeries/compaction thread's rewrite_tags_atomic
    directory swap — an append whose Spark job is mid-commit (files
    under _temporary) when the swap renames the live dir either fails
    the batch or commits into the .bak dir that is rmtree'd (silent,
    permanent loss). Both now serialize on _TAGS_REWRITE_LOCK; drive
    them hard from two threads and assert zero errors and zero lost
    batches across repeated rewrites."""
    import threading

    from graphouse_spark.sources.tables import (
        read_tags, rewrite_tags_atomic, write_tags)
    from graphouse_spark.tags import tag_index_rows

    tags_path = str(tmp_path / "tags")
    BASE = 1_700_000_000
    seed = spark.createDataFrame([("seed.metric;dc=a", BASE)],
                                 "name string, updated long")
    write_tags(tag_index_rows(seed), tags_path)

    N_APPENDS, N_REWRITES = 10, 5
    errors: list = []

    def appender():
        try:
            for i in range(N_APPENDS):
                df = spark.createDataFrame(
                    [(f"m{i}.x;dc=b", BASE)], "name string, updated long")
                write_tags(tag_index_rows(df), tags_path)
        except Exception as exc:  # noqa: BLE001 - collected for assert
            errors.append(exc)

    def rewriter():
        try:
            for _ in range(N_REWRITES):
                rewrite_tags_atomic(spark, tags_path, lambda idx: idx)
        except Exception as exc:  # noqa: BLE001 - collected for assert
            errors.append(exc)

    threads = [threading.Thread(target=appender),
               threading.Thread(target=rewriter)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    metrics = {r["metric"] for r in read_tags(spark, tags_path).collect()}
    expected = {"seed.metric;dc=a"} | {f"m{i}.x;dc=b"
                                       for i in range(N_APPENDS)}
    assert expected <= metrics


def test_del_series_get_is_405(spark, tmp_path):
    """Destructive delSeries must not be reachable over GET."""
    import urllib.error
    import urllib.request

    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch
    from pyspark.sql import functions as F

    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    raw = spark.createDataFrame([("one_min.g.x 1.0 1000",)], "value string")
    from graphouse_spark.sources.graphite import parse_lines
    ingest_batch(parse_lines(raw, updated=F.lit(1)), cfg, known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path)
    svc.load_tree()
    server = start_http_server(svc)
    port = server.server_address[1]
    try:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tags/delSeries?path=x;a=1",
                timeout=30)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 405
    finally:
        server.shutdown()


# ------------------------------------------- distinct-values sub-index


def _ingest_tagged(spark, tmp_path, lines, base):
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(base)), cfg,
                 known_names=None)
    return cfg


def test_tag_values_subindex_maintained_by_ingest(spark, tmp_path):
    """Each write_tags append also appends the batch's distinct
    (tag, value) pairs to the sub-index — which therefore stays a
    SUPERSET of the main index's pairs (the regex-prune correctness
    contract)."""
    import time as _time

    from graphouse_spark.sources.tables import (
        read_tag_values, read_tags)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",
        f"disk.used;datacenter=dc2;rack=b2 2.0 {BASE}",
    ], BASE)
    vals = read_tag_values(spark, cfg.tags_path)
    assert vals is not None
    got = {(r["tag"], r["value"]) for r in vals.collect()}
    main = {(r["tag"], r["value"])
            for r in read_tags(spark, cfg.tags_path).collect()}
    assert main <= got
    assert ("datacenter", "dc1") in got and ("rack", "b2") in got
    # replay keeps it a (possibly duplicated) superset
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc1;rack=a1 1.0 {BASE}",)], "value string")
    from graphouse_spark.streaming.ingest import ingest_batch
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    got2 = {(r["tag"], r["value"])
            for r in read_tag_values(spark, cfg.tags_path).collect()}
    assert got <= got2


def test_rewrite_tags_atomic_compacts_subindex(spark, tmp_path):
    """delSeries (a keep-only transform) shrinks the sub-index to the
    surviving pairs; the main/sub superset contract holds after."""
    import time as _time

    from pyspark.sql import functions as SF

    from graphouse_spark.sources.tables import (
        read_tag_values, read_tags, rewrite_tags_atomic)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
        f"net.rx;datacenter=dc2 2.0 {BASE}",
    ], BASE)
    rewrite_tags_atomic(
        spark, cfg.tags_path,
        lambda idx: idx.filter(SF.col("metric") != "net.rx;datacenter=dc2"))
    main = {(r["tag"], r["value"])
            for r in read_tags(spark, cfg.tags_path).collect()}
    sub = {(r["tag"], r["value"])
           for r in read_tag_values(spark, cfg.tags_path).collect()}
    assert main <= sub
    assert ("datacenter", "dc2") not in sub  # compacted away
    assert ("name", "net.rx") not in sub


def test_regex_only_browse_prunes_on_subindex(spark, tmp_path):
    """A regex-only term set resolves against the distinct-values
    sub-index and rewrites into a value-IN-list on the main index —
    the plan never touches the points table and never compiles the
    whole namespace; answers equal the map-compile fallback's."""
    import time as _time

    from graphouse_spark.api.service import GraphouseService

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc{i % 3};rack=r{i} 1.0 {BASE}"
        for i in range(30)
    ], BASE)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           tags_path=cfg.tags_path)
    df = svc._tagged_names(["datacenter=~dc[01]"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "/data" not in plan
    # the prune rewrote the regex into value equalities on the index
    assert "dc0" in plan and "dc1" in plan
    got = sorted(r["metric"] for r in df.collect())
    assert got == sorted(
        f"disk.used;datacenter=dc{i % 3};rack=r{i}"
        for i in range(30) if i % 3 in (0, 1))

    # cap exceeded -> rlike-on-slice fallback, same answers
    svc._REGEX_VALUES_CAP = 1
    df2 = svc._tagged_names(["datacenter=~dc[01]"])
    assert sorted(r["metric"] for r in df2.collect()) == got

    # sub-index absent (pre-sub-index deployment) -> same fallback
    import shutil

    from graphouse_spark.sources.tables import tag_values_path
    svc2 = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                            tags_path=cfg.tags_path)
    shutil.rmtree(tag_values_path(cfg.tags_path))
    df3 = svc2._tagged_names(["datacenter=~dc[01]"])
    assert sorted(r["metric"] for r in df3.collect()) == got


def test_regex_literal_prefix():
    """Literal-prefix derivation for sargable rlike bounds: the prefix
    must be one every match provably starts with — alternations kill
    it, quantifiers un-guarantee their operand (except +), escape
    classes stop the scan, escaped metachars are literals."""
    cases = {
        "h1.*": "h1", "dc[01]": "dc", ".*x": "", "abc": "abc",
        "h1|h2": "", "h1?": "h", "h1?x": "h", "h1+z": "h1",
        "a\\.b.*": "a.b", "\\d+": "", "^srv.*": "srv", "a{2}": "",
        "(?:x)y": "", "": "", "h\\|x": "", "ab$": "ab",
    }
    for pat, want in cases.items():
        got = T.regex_literal_prefix(pat)
        assert got == want, (pat, got, want)
    # soundness sweep: every derived prefix is implied by the pattern
    import random
    import re as _re

    rng = random.Random(7)
    alphabet = "ab1.*?[]|\\+^$"
    for _ in range(300):
        pat = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        try:
            rx = _re.compile(T.anchored_pattern(pat))
        except _re.error:
            continue
        pfx = T.regex_literal_prefix(pat)
        if not pfx:
            continue
        # any value matching the anchored pattern must start with pfx:
        # check on a brute-forced value corpus
        for v in ["a", "b", "ab", "a1", "ba", "ab1", "a.b", "aab",
                  "b1a", "abab", pfx, pfx + "x", "x" + pfx]:
            if rx.match(v):
                assert v.startswith(pfx), (pat, pfx, v)


def test_regex_prune_skips_negated_and_invalid(spark, tmp_path):
    """'!=~' is evaluated as a NEGATIVE exists-test (anti-join side):
    missing-tag series match the negation. The value-IN-list rewrite
    DOES apply to negated regex terms — it is safe under the
    sub-index's superset contract (the anti-join subtracts exactly the
    metrics whose tag value matches). An invalid pattern still
    surfaces as series_by_tag's ValueError."""
    import time as _time

    from graphouse_spark.api.service import GraphouseService

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
        f"net.rx;rack=a1 2.0 {BASE}",
    ], BASE)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           tags_path=cfg.tags_path,
                           # the negated-only set below is all-negative
                           # (refused by default since round 12)
                           allow_all_negative_tag_queries=True)
    # a negated regex is a NEGATIVE exists-test (anti-join side)
    _, positive, rewritten = T.index_exists_pred("datacenter", "!=~", "dc.*")
    assert positive is False and rewritten is False
    # the IN-list rewrite engages on negated terms too (superset
    # contract makes it safe on the anti-join side)
    _, positive, rewritten = T.index_exists_pred(
        "datacenter", "!=~", "dc.*", regex_values=lambda k, p: ["dc1", "dc2"])
    assert positive is False and rewritten is True
    # negated-only set: missing-tag series match (net.rx has no
    # datacenter tag -> matches the negation)
    got = sorted(r["metric"]
                 for r in svc._tagged_names(["datacenter!=~dc9.*"]).collect())
    assert got == ["disk.used;datacenter=dc1", "net.rx;rack=a1"]
    with pytest.raises(ValueError):
        svc._tagged_names(["rack=~[unclosed"])


def test_backfill_builds_values_subindex(spark, tmp_path):
    """backfill_tag_index writes the sub-index too, so pre-index lakes
    get the regex-prune path on their first index build."""
    import time as _time

    from graphouse_spark.sources.tables import read_tag_values

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
    ], BASE)
    tags2 = str(tmp_path / "tags2")
    n = T.backfill_tag_index(spark, cfg.data_path, tags2)
    assert n == 2  # name + datacenter rows
    vals = read_tag_values(spark, tags2)
    assert {(r["tag"], r["value"]) for r in vals.collect()} == {
        ("name", "disk.used"), ("datacenter", "dc1")}


def test_has_positive_term_matches_evaluator_classification(spark):
    """The refusal guard and the evaluator must agree on what counts
    as a positive term — a guard that diverges either refuses servable
    queries or lets the full-universe shape through. Property: for any
    term set whose regexes cannot match the empty string,
    has_positive_term == any(index_exists_pred positive). (For
    MATCHES-EMPTY regexes the guard is deliberately STRICTER than the
    evaluator — see test_matches_empty_regex_is_not_positive — so the
    guard may refuse where the evaluator would classify positive,
    never the reverse.)"""
    ops = ["=", "!=", "=~", "!=~"]
    vals = {"=": ["", "v1"], "!=": ["", "v1"],
            "=~": ["v.*"], "!=~": ["v.*"]}
    singles = [f"k{o}{v}" for o in ops for v in vals[o]]
    import itertools
    for terms in itertools.chain(
            ([s] for s in singles),
            itertools.combinations(singles, 2),
            itertools.combinations(singles, 3)):
        terms = list(terms)
        via_guard = T.has_positive_term(terms)
        via_eval = any(T.index_exists_pred(*T.parse_term(t))[1]
                       for t in terms)
        assert via_guard == via_eval, terms


def test_matches_empty_regex_is_not_positive():
    """Round-12 ADVICE: a ``k=~p`` whose pattern matches the empty
    string (k=~.*, k=~(v)?) constrains nothing — graphite-web's TagDB
    (matches_empty) treats it as non-positive, and counting it
    positive would let a match-everything regex bypass the
    all-negative 413 guard while costing a near-universe slice scan."""
    for t in (["k=~.*"], ["k=~(v1)?"], ["k=~"], ["k=~.*", "j!=v"]):
        assert not T.has_positive_term(t), t
        assert T.is_all_negative(t), t
    # a regex that REQUIRES at least one char stays positive
    for t in (["k=~v.*"], ["k=~.+"], ["k=~(a|b)"]):
        assert T.has_positive_term(t), t
        assert not T.is_all_negative(t), t
    # guard is one-way stricter: guard-positive implies eval-positive
    for term in ("k=~.*", "k=~.+", "k=v", "k!=", "k=", "k!=v", "k!=~p"):
        if T.has_positive_term([term]):
            assert T.index_exists_pred(*T.parse_term(term))[1], term


def test_all_negative_term_sets_refused_by_default(spark, tmp_path):
    """Round-11 verdict #2: seriesByTag term sets with NO positive term
    (nothing requires a non-empty tag match) are refused with the
    over-wide-glob 413 posture — graphite-web's own TagDB rejects the
    shape, and its evaluation floor is a full-universe scan (the one
    measured tag plan above the 3 s / 10M target). The one-pass
    evaluator stays available behind allow_all_negative_tag_queries."""
    import json as _json
    import time as _time

    from graphouse_spark.api.service import (
        GraphouseService, QueryLimitExceeded)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
        f"net.rx;rack=r1 2.0 {BASE}",
    ], BASE)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           tags_path=cfg.tags_path)
    svc.tag_lookback_days = 36500
    svc.load_tree()

    # every all-negative shape refuses: k=, k!=v, k!=~p, and combos
    for exprs in (["datacenter="], ["datacenter!=dc1"],
                  ["rack!=~r.*"], ["datacenter!=dc1", "rack!=r7"]):
        with pytest.raises(QueryLimitExceeded, match="non-empty match"):
            svc.tag_find_series(exprs)
    # ...including on the render path
    with pytest.raises(QueryLimitExceeded, match="non-empty match"):
        svc.render("seriesByTag('datacenter!=dc9')", BASE - 10, BASE + 70)

    # the guard never masks other error classes (r12 code-review
    # find): a malformed term is the evaluator's ValueError (HTTP
    # 400), not an all-negative refusal (413)
    with pytest.raises(ValueError, match="malformed|bad regex"):
        svc.tag_find_series(["garbage-no-operator"])
    assert not T.is_all_negative([])  # empty set is the caller's 400

    # positive shapes still serve: k=v, k!= (tag present), k=~p
    assert _json.loads(svc.tag_find_series(["datacenter=dc1"])) == [
        f"disk.used;datacenter=dc1"]
    assert _json.loads(svc.tag_find_series(["rack!="])) == [
        "net.rx;rack=r1"]
    assert _json.loads(svc.tag_find_series(["datacenter=~dc.*"])) == [
        "disk.used;datacenter=dc1"]
    # a negative term combined with a positive one is fine
    assert _json.loads(svc.tag_find_series(
        ["rack!=", "datacenter!=dc9"])) == ["net.rx;rack=r1"]

    # the opt-in restores the one-pass evaluator, same answers as the
    # tag-map compile
    permissive = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                                  tags_path=cfg.tags_path,
                                  allow_all_negative_tag_queries=True)
    permissive.tag_lookback_days = 36500
    assert _json.loads(permissive.tag_find_series(["datacenter="])) == [
        "net.rx;rack=r1"]
    assert _json.loads(permissive.tag_find_series(["datacenter!=dc1"])) == [
        "net.rx;rack=r1"]


def test_bulk_tag_append_writes_in_parallel(spark, tmp_path, monkeypatch):
    """Round-11 verdict #5: write_tags is size-gated. A micro-batch
    append stays one file per date (what the compaction sweep
    expects); a bulk append (whisper migration with --tagged-ingest)
    switches to the hash-partitioned backfill layout instead of
    funneling every row through one task."""
    import glob as _glob

    from graphouse_spark.sources import tables as tbl

    def rows(n, start=0):
        return spark.range(start, start + n).select(
            F.concat(F.lit("m"), F.col("id").cast("string"),
                     F.lit(";host=h"), F.col("id").cast("string"))
            .alias("metric"),
            F.lit("host").alias("tag"),
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("value"),
            F.to_date(F.lit("2023-11-14")).alias("date"))

    monkeypatch.setattr(tbl, "TAG_APPEND_SINGLE_FILE_MAX", 100)
    path = str(tmp_path / "tags")

    # micro-batch (under the gate): exactly one file in the partition
    tbl.write_tags(rows(10), path)
    part = f"{path}/date=2023-11-14"
    assert len(_glob.glob(f"{part}/*.parquet")) == 1

    # bulk (over the gate): parallel layout — multiple files, and the
    # index still reads back complete
    tbl.write_tags(rows(500, start=10), path)
    assert len(_glob.glob(f"{part}/*.parquet")) > 2
    assert tbl.read_tags(spark, path).count() == 510


def test_backfill_crash_leaves_no_stale_subindex(spark, tmp_path,
                                                 monkeypatch):
    """Round-11 ADVICE (medium): a crash AFTER the main-index overwrite
    but BEFORE the sub-index write used to leave a PRE-EXISTING values
    sub-index live and stale. Backfill introduces new (tag, value)
    pairs, so the stale sub-index was not a superset — =~/!=~ IN-list
    rewrites would silently drop live values. The fix deletes the old
    sub-index up front, so every crash point leaves the documented
    ABSENT-sub-index fallback (slower, correct); a rerun completes."""
    import time as _time

    from graphouse_spark.sources import tables as tbl
    from graphouse_spark.sources.tables import read_tag_values, read_tags

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
    ], BASE)
    tags2 = str(tmp_path / "tags2")
    # first backfill: main + sub-index complete
    T.backfill_tag_index(spark, cfg.data_path, tags2)
    assert read_tag_values(spark, tags2) is not None

    # new series with a NEW (tag, value) pair lands in the lake
    _ingest_tagged(spark, tmp_path, [
        f"net.rx;datacenter=dc9 2.0 {BASE}",
    ], BASE)

    # second backfill crashes between the two writes: read_tags is the
    # first thing the sub-index derivation touches after the main write
    real_read_tags = tbl.read_tags

    def crashing(*a, **kw):
        raise RuntimeError("injected crash before sub-index write")

    monkeypatch.setattr(tbl, "read_tags", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        T.backfill_tag_index(spark, cfg.data_path, tags2)
    monkeypatch.setattr(tbl, "read_tags", real_read_tags)

    # the main index IS the new one (overwrite completed)...
    mains = {(r["tag"], r["value"])
             for r in real_read_tags(spark, tags2).collect()}
    assert ("datacenter", "dc9") in mains
    # ...and the sub-index is ABSENT, not stale: readers fall back to
    # the regex prune on main-index rows instead of dropping dc9
    assert read_tag_values(spark, tags2) is None

    # a micro-batch append arriving BEFORE the backfill rerun must NOT
    # re-create the sub-index from just its own pairs — that partial
    # sub-index would not be a superset of the main rows and the
    # IN-list rewrite would silently drop dc9 (r12 code-review find)
    batch = spark.createDataFrame(
        [("web.hits;datacenter=dc2", "name", "web.hits", "2023-11-14"),
         ("web.hits;datacenter=dc2", "datacenter", "dc2", "2023-11-14")],
        "metric string, tag string, value string, date string"
    ).withColumn("date", F.to_date("date"))
    from graphouse_spark.sources.tables import write_tags
    write_tags(batch, tags2)
    assert read_tag_values(spark, tags2) is None
    # the main rows DID append (the series is not lost)
    assert ("datacenter", "dc2") in {
        (r["tag"], r["value"])
        for r in real_read_tags(spark, tags2).collect()}

    # rerun completes both writes; sub-index covers the new pair
    T.backfill_tag_index(spark, cfg.data_path, tags2)
    vals = {(r["tag"], r["value"])
            for r in read_tag_values(spark, tags2).collect()}
    assert ("datacenter", "dc9") in vals


def test_concurrent_compaction_and_del_series_serialize(spark, tmp_path):
    """Round-9 verdict #8: nightly compaction racing an HTTP delSeries.
    Two interleaved rewrites are unsafe by construction (each would
    carry the other's staged output into its own stage as 'appends',
    resurrecting dropped rows); rewrite_tags_atomic therefore holds a
    whole-rewrite mutex. This drives BOTH from threads with the
    compaction transform parked mid-flight and proves (a) the second
    rewrite never overlaps the first, (b) the final index is exactly
    compacted-minus-deleted."""
    import threading
    import time as _time

    from graphouse_spark.maintenance import run_tags_compaction
    from graphouse_spark.sources.tables import (
        read_tag_values, read_tags, rewrite_tags_atomic)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
        f"net.rx;datacenter=dc2 2.0 {BASE}",
    ], BASE)
    # duplicate the rows (an active series re-appends every batch)
    raw = spark.createDataFrame(
        [(f"disk.used;datacenter=dc1 3.0 {BASE}",),
         (f"net.rx;datacenter=dc2 4.0 {BASE}",)], "value string")
    from graphouse_spark.streaming.ingest import ingest_batch
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(BASE)), cfg,
                 known_names=None)
    assert read_tags(spark, cfg.tags_path).count() == 8  # 2x duplicated

    spans: dict[str, tuple[float, float]] = {}
    entered = threading.Event()
    errors: list[BaseException] = []

    def compaction():
        def transform(idx):
            t0 = _time.monotonic()
            entered.set()
            _time.sleep(2)  # park mid-rewrite while delSeries fires
            out = idx.distinct()
            spans["compact"] = (t0, _time.monotonic())
            return out
        try:
            rewrite_tags_atomic(spark, cfg.tags_path, transform)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    def deleter():
        entered.wait(30)

        def transform(idx):
            t0 = _time.monotonic()
            out = idx.filter(F.col("metric") != "net.rx;datacenter=dc2")
            spans["delete"] = (t0, _time.monotonic())
            return out
        try:
            rewrite_tags_atomic(spark, cfg.tags_path, transform)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    t1 = threading.Thread(target=compaction)
    t2 = threading.Thread(target=deleter)
    t1.start(); t2.start()
    t1.join(120); t2.join(120)
    assert not errors, errors

    # (a) no overlap: the delete's transform started after the
    # compaction's transform finished (the serial mutex covers the
    # whole protocol, so transform spans cannot interleave)
    assert spans["delete"][0] >= spans["compact"][1]

    # (b) final state: deduped and the deleted series gone
    rows = {(r["metric"], r["tag"], r["value"])
            for r in read_tags(spark, cfg.tags_path).collect()}
    assert rows == {("disk.used;datacenter=dc1", "name", "disk.used"),
                    ("disk.used;datacenter=dc1", "datacenter", "dc1")}
    assert read_tags(spark, cfg.tags_path).count() == 2
    # sub-index compacted to match (superset contract holds)
    sub = {(r["tag"], r["value"])
           for r in read_tag_values(spark, cfg.tags_path).collect()}
    assert sub == {("name", "disk.used"), ("datacenter", "dc1")}

    # idempotence after the race: another compaction changes nothing
    assert run_tags_compaction(spark, cfg.tags_path) == 2


def test_rewrite_crash_at_swap_leaves_old_index(spark, tmp_path, monkeypatch):
    """Injected crash at the live->bak rename: the rewrite fails, the
    OLD index stays fully live (reads unchanged), the stage dir is
    cleaned, and the next rewrite succeeds."""
    import os as _os
    import time as _time

    from graphouse_spark.fs import Fs
    from graphouse_spark.sources.tables import (
        read_tags, rewrite_tags_atomic)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
        f"net.rx;datacenter=dc2 2.0 {BASE}",
    ], BASE)
    before = {(r["metric"], r["tag"], r["value"])
              for r in read_tags(spark, cfg.tags_path).collect()}

    real_rename = Fs.rename
    fired = {"n": 0}

    def flaky(self, src, dst):
        # the commit layer goes through the Hadoop FS wrapper — inject
        # there (os.rename no longer appears anywhere in the protocol)
        if src.rstrip("/") == cfg.tags_path.rstrip("/") and fired["n"] == 0:
            fired["n"] += 1
            raise OSError("injected crash at swap")
        return real_rename(self, src, dst)

    monkeypatch.setattr(Fs, "rename", flaky)
    with pytest.raises(OSError, match="injected crash"):
        rewrite_tags_atomic(
            spark, cfg.tags_path,
            lambda idx: idx.filter(F.col("metric") != "net.rx;datacenter=dc2"))
    assert fired["n"] == 1
    # old index fully intact
    after = {(r["metric"], r["tag"], r["value"])
             for r in read_tags(spark, cfg.tags_path).collect()}
    assert after == before
    # stage dir cleaned by the failed rewrite's error path
    parent = _os.path.dirname(cfg.tags_path)
    assert not [d for d in _os.listdir(parent) if d.startswith(".stage-")]

    # retry (rename healthy now) succeeds and applies the delete
    n = rewrite_tags_atomic(
        spark, cfg.tags_path,
        lambda idx: idx.filter(F.col("metric") != "net.rx;datacenter=dc2"))
    assert n == 2
    kept = {r["metric"] for r in read_tags(spark, cfg.tags_path).collect()}
    assert kept == {"disk.used;datacenter=dc1"}


def test_render_regex_resolution_ignores_browse_lookback(spark, tmp_path):
    """A series last seen OUTSIDE the browse lookback must still
    resolve on the RENDER path through a =~ term (render reads the
    full index; the sub-index value-list rewrite must not apply the
    browse window there) — while /tags browsing correctly ages it
    out."""
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.retention import (
        CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)

    BASE = 1_542_199_500  # 2018 — far outside any lookback
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1 1.0 {BASE}",
    ], BASE)
    provider = CombinedRetentionProvider(
        [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60}))])
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                           provider, tags_path=cfg.tags_path)
    svc.load_tree()
    # browse: aged out of the 7-day window
    import json as _json
    assert _json.loads(svc.tag_find_series(["datacenter=~dc.*"])) == []
    # render: the =~ term resolves against the full index
    out = svc.render("seriesByTag('datacenter=~dc.*')",
                     BASE - 10, BASE + 70)
    assert [s["target"] for s in out] == ["disk.used;datacenter=dc1"]


def test_index_evaluator_equals_map_compile_randomized(spark):
    """Seeded randomized equivalence: series_by_tag_on_index (the
    slice-intersection index path) returns EXACTLY the metrics the
    map-compile evaluator (series_by_tag over names) returns, across
    random term sets covering every operator (=, !=, =~, !=~; empty
    values; name= terms; missing tags; multi-term mixes)."""
    import random as _random

    rng = _random.Random(0xC0FFEE)
    paths = [f"disk.m{i}" for i in range(3)]
    tagkeys = ["dc", "rack", "env"]
    values = [f"v{i}" for i in range(4)]
    names = []
    for i in range(40):
        path = rng.choice(paths)
        tags = {k: rng.choice(values)
                for k in tagkeys if rng.random() < 0.7}
        name = ";".join([path] + [f"{k}={v}"
                                  for k, v in sorted(tags.items())])
        names.append(name)
    names = sorted(set(names))
    names_df = spark.createDataFrame([(n,) for n in names],
                                     "metric string")
    idx_rows = []
    for n in names:
        _, tags = T.parse_tagged(n)
        idx_rows.extend((n, k, v) for k, v in tags.items())
    idx = spark.createDataFrame(idx_rows, "metric string, tag string, value string")

    def random_term():
        key = rng.choice(tagkeys + ["name"])
        op = rng.choice(["=", "!=", "=~", "!=~"])
        if op in ("=", "!="):
            val = rng.choice(
                values + (paths if key == "name" else []) + [""] + ["nope"])
        else:
            val = rng.choice(["v[01].*", "v.*", "disk\\..*", "v2", "x.*"])
        return f"{key}{op}{val}"

    checked = all_negative = 0
    for _ in range(40):
        terms = [random_term() for _ in range(rng.randint(1, 3))]
        via_index = {r["metric"] for r in
                     T.series_by_tag_on_index(idx, terms).collect()}
        via_maps = {r["metric"] for r in
                    T.series_by_tag(names_df, terms).collect()}
        assert via_index == via_maps, (terms, via_index ^ via_maps)
        checked += 1
        if all(not T.index_exists_pred(*T.parse_term(t))[1]
               for t in terms):
            all_negative += 1
    assert checked == 40
    # the all-negative one-pass conditional-agg path must be exercised
    # (no positive term -> no slice intersection; round-11 plan change)
    assert all_negative >= 5, all_negative


def test_universe_slice_serves_all_negative_identically(spark, tmp_path):
    """Round-12 verdict #3: the all-negative (opt-in) shapes serve
    their universe side from the compacted distinct-metric sub-index;
    answers are identical with the slice present, absent (fallback to
    the name-slice one-pass plan), and after a rewrite rebuilt it."""
    import json as _json
    import shutil
    import time as _time

    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.sources.tables import (
        read_tag_metrics, rewrite_tags_atomic, tag_metrics_path)

    BASE = int(_time.time()) - 3600
    cfg = _ingest_tagged(spark, tmp_path, [
        f"disk.used;datacenter=dc1;rack=r1 1.0 {BASE}",
        f"disk.used;datacenter=dc2 2.0 {BASE}",
        f"net.rx;rack=r2 3.0 {BASE}",
        f"cpu.idle 4.0 {BASE}",  # untagged: not in the tag universe
    ], BASE)

    def svc():
        s = GraphouseService(spark, cfg.data_path, cfg.metrics_path,
                             tags_path=cfg.tags_path,
                             allow_all_negative_tag_queries=True)
        s.tag_lookback_days = 36500
        s.load_tree()
        return s

    shapes = (["datacenter="], ["datacenter!=dc1"], ["rack!=~r1.*"],
              ["datacenter!=dc1", "rack!=r9"])
    assert read_tag_metrics(spark, cfg.tags_path) is not None  # bootstrapped
    with_slice = {tuple(e): _json.loads(svc().tag_find_series(e))
                  for e in shapes}
    # the universe plan actually engages: the main index's name slice
    # is NOT scanned (no tag=name pushed filter anywhere in the plan)
    plan = svc()._tagged_names(["datacenter="])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EqualTo(tag,name)" not in plan

    shutil.rmtree(tag_metrics_path(cfg.tags_path))
    assert read_tag_metrics(spark, cfg.tags_path) is None
    without = {tuple(e): _json.loads(svc().tag_find_series(e))
               for e in shapes}
    assert with_slice == without
    plan = svc()._tagged_names(["datacenter="])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EqualTo(tag,name)" in plan  # fallback scans the name slice

    # a rewrite rebuilds the slice exactly (here: identity transform)
    rewrite_tags_atomic(spark, cfg.tags_path, lambda idx: idx)
    mets = {r["metric"]
            for r in read_tag_metrics(spark, cfg.tags_path).collect()}
    from graphouse_spark.sources.tables import read_tags
    assert mets == {r["metric"]
                    for r in read_tags(spark, cfg.tags_path).collect()}
    rebuilt = {tuple(e): _json.loads(svc().tag_find_series(e))
               for e in shapes}
    assert rebuilt == with_slice

    # deletion EXACTNESS: a delSeries-shaped rewrite must not leave the
    # deleted metric resurrectable via the all-negative universe
    rewrite_tags_atomic(
        spark, cfg.tags_path,
        lambda idx: idx.filter(~F.col("metric").contains("net.rx")))
    after = _json.loads(svc().tag_find_series(["datacenter="]))
    assert after == [m for m in with_slice[("datacenter=",)]
                     if "net.rx" not in m]
