"""WITH FILL unification (round-8 verdict item #6): one semantics in
operators.gapfill, two execution paths — the driver walk and the
distributed sequence-explode — proven identical on goldens and on
randomized inputs, plus the routing and the unbounded-range refusal."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType)

from graphouse_spark.operators.gapfill import (
    estimate_filled_rows, stepped_fill, stepped_fill_frame,
    stepped_fill_rows)

SCHEMA = StructType([
    StructField("ts", LongType()),
    StructField("v", DoubleType()),
    StructField("tag", StringType()),
])
R = Row("ts", "v", "tag")


def _spec(**kw):
    spec = {"col": "ts", "desc": False, "from": None, "to": None,
            "step": 1, "interpolate": [], "limit": None}
    spec.update(kw)
    return spec


def _both(spark, rows, spec):
    a = stepped_fill_rows(rows, SCHEMA, spec)
    b = stepped_fill_frame(spark, rows, SCHEMA, spec)
    return a, b


def test_paths_agree_on_goldens(spark):
    rows = [R(1000, 1.0, "a"), R(1120, 2.0, "b"), R(1180, 3.0, "c")]
    cases = [
        _spec(step=60),
        _spec(step=60, **{"from": 880, "to": 1360}),
        _spec(step=60, interpolate=["v"]),
        _spec(step=60, interpolate=["v", "tag"], **{"from": 940}),
        _spec(step=37, **{"to": 1300}),
    ]
    for spec in cases:
        a, b = _both(spark, rows, spec)
        assert a == b, spec
    # descending
    drows = [R(1180, 3.0, "c"), R(1120, 2.0, "b"), R(1000, 1.0, "a")]
    for spec in [_spec(desc=True, step=60),
                 _spec(desc=True, step=60, **{"from": 1300, "to": 880}),
                 _spec(desc=True, step=60, interpolate=["v"])]:
        a, b = _both(spark, drows, spec)
        assert a == b, spec


def test_paths_agree_on_duplicate_keys(spark):
    rows = [R(10, 1.0, "a"), R(10, 2.0, "b"), R(13, 3.0, "c")]
    a, b = _both(spark, rows, _spec(step=1, interpolate=["v"]))
    assert a == b
    assert [r["ts"] for r in a] == [10, 10, 11, 12, 13]
    assert [r["v"] for r in a] == [1.0, 2.0, 2.0, 2.0, 3.0]


@settings(max_examples=25, deadline=None)
@given(
    ts=st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                max_size=8),
    step=st.integers(min_value=1, max_value=7),
    frm=st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
    to=st.one_of(st.none(), st.integers(min_value=250, max_value=400)),
    desc=st.booleans(),
    interp=st.booleans(),
)
def test_paths_agree_property(spark, ts, step, frm, to, desc, interp):
    ts = sorted(set(ts), reverse=desc)
    rows = [R(t, float(i), f"t{i}") for i, t in enumerate(ts)]
    spec = _spec(step=step, desc=desc,
                 interpolate=["v"] if interp else [])
    # orient FROM/TO with the sort direction like the SQL layer does
    if desc:
        spec["from"], spec["to"] = to, frm
    else:
        spec["from"], spec["to"] = frm, to
    sgn = -1 if desc else 1
    if spec["from"] is not None and (ts[0] - spec["from"]) * sgn < 0:
        spec["from"] = None  # degenerate FROM: router sends it driver-side
    a, b = _both(spark, rows, spec)
    assert a == b, spec
    assert estimate_filled_rows(rows, SCHEMA, spec) == len(a) - len(rows)


def test_router_refuses_unbounded_expansion(spark):
    rows = [R(0, 1.0, "a")]
    with pytest.raises(ValueError, match="WITH FILL would produce"):
        stepped_fill(spark, rows, SCHEMA,
                     _spec(**{"to": 10_000_000_000}))


def test_router_distributes_large_expansions(spark):
    # 20k fill rows > the 5k threshold: the frame path runs and the
    # result is exactly the driver walk's
    rows = [R(0, 1.0, "a"), R(20_000, 2.0, "b")]
    spec = _spec(interpolate=["v"])
    out = stepped_fill(spark, rows, SCHEMA, spec)
    assert len(out) == 2 + 19_999
    assert out[0] == R(0, 1.0, "a")
    assert out[1] == R(1, 1.0, "")  # carried v, default tag
    assert out[-1] == R(20_000, 2.0, "b")
    assert out == stepped_fill_rows(rows, SCHEMA, spec)


def test_query_with_fill_distributed_path_e2e(spark, tmp_path):
    """The /query surface golden through the DISTRIBUTED path: force a
    tiny threshold so the same SQL that the driver path serves goes
    through sequence-explode, and the formatted output is unchanged."""
    from unittest import mock

    from pyspark.sql import functions as F

    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.operators import gapfill
    from graphouse_spark.sources.graphite import parse_lines
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    rows = ["one_min.sf.a 1.0 1000", "one_min.sf.a 4.0 1180"]
    raw = spark.createDataFrame([(l,) for l in rows], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(100)), cfg, known_names=None)
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path)
    q = ("SELECT timestamp AS ts, sum(value) AS v FROM graphite.data "
         "GROUP BY ts ORDER BY ts WITH FILL FROM 1000 TO 1240 STEP 60 "
         "INTERPOLATE (v)")
    small = svc.sql(q)
    with mock.patch.object(gapfill, "stepped_fill",
                           side_effect=lambda sp, r, s, f, **kw:
                           gapfill.stepped_fill_frame(sp, r, s, f)) as m:
        # service imports the router lazily from the module, so the
        # patch intercepts the call
        big = svc.sql(q)
    assert m.called
    assert big == small
    # TO is exclusive: no 1240 row
    assert small.splitlines() == [
        "1000\t1.0", "1060\t1.0", "1120\t1.0", "1180\t4.0"]
