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


# -- CH INTERPOLATE (col AS expr) — round-8 verdict item #6 --

def _espec(**kw):
    spec = _spec(**kw)
    spec.setdefault("interpolate_exprs", {})
    return spec


def test_interp_expr_counts_up(spark):
    """CH doc example shape: `INTERPOLATE (v AS v + 1)` chains across
    consecutive fill rows (each fill row is the next previous row)."""
    from graphouse_spark.operators.gapfill import stepped_fill_rows_expr

    rows = [R(1, 1.0, "a"), R(5, 10.0, "b")]
    spec = _espec(interpolate=["v"],
                  interpolate_exprs={"v": "v + 1"})
    out = stepped_fill_rows_expr(spark, rows, SCHEMA, spec)
    assert [(r["ts"], r["v"], r["tag"]) for r in out] == [
        (1, 1.0, "a"),
        (2, 2.0, ""), (3, 3.0, ""), (4, 4.0, ""),  # chains 1->2->3->4
        (5, 10.0, "b"),
    ]


def test_interp_expr_plain_entries_mix(spark):
    """Plain entries carry; AS entries evaluate — in one clause."""
    from graphouse_spark.operators.gapfill import stepped_fill_rows_expr

    rows = [R(1, 2.0, "x"), R(4, 9.0, "y")]
    spec = _espec(interpolate=["v", "tag"],
                  interpolate_exprs={"v": "v * 2"})
    out = stepped_fill_rows_expr(spark, rows, SCHEMA, spec)
    assert [(r["ts"], r["v"], r["tag"]) for r in out] == [
        (1, 2.0, "x"), (2, 4.0, "x"), (3, 8.0, "x"), (4, 9.0, "y")]


def test_interp_expr_equals_carry_when_identity(spark):
    """`col AS col` must equal the plain carry path on any input —
    the property tying both implementations to one semantics."""
    from graphouse_spark.operators.gapfill import (
        stepped_fill_rows, stepped_fill_rows_expr)

    rows = [R(0, 1.5, "a"), R(7, 2.5, "b"), R(9, 3.5, "c")]
    for spec_kw in [dict(step=2), dict(step=1, **{"from": -3, "to": 14}),
                    dict(step=3, **{"to": 20})]:
        carry = _spec(interpolate=["v"], **spec_kw)
        expr = _espec(interpolate=["v"],
                      interpolate_exprs={"v": "v"}, **spec_kw)
        a = stepped_fill_rows(rows, SCHEMA, carry)
        b = stepped_fill_rows_expr(spark, rows, SCHEMA, expr)
        assert a == b, spec_kw


def test_interp_expr_leading_fills_take_defaults(spark):
    """Before the first row there is no previous row: leading FROM
    fills get type defaults, no expression evaluation (CH parity with
    the carry path)."""
    from graphouse_spark.operators.gapfill import stepped_fill_rows_expr

    rows = [R(5, 3.0, "a"), R(8, 4.0, "b")]
    spec = _espec(interpolate=["v"], interpolate_exprs={"v": "v + 10"},
                  **{"from": 3})
    out = stepped_fill_rows_expr(spark, rows, SCHEMA, spec)
    assert [(r["ts"], r["v"]) for r in out] == [
        (3, 0.0), (4, 0.0),            # leading: defaults
        (5, 3.0), (6, 13.0), (7, 23.0),  # chained expr fills
        (8, 4.0)]


def test_interp_expr_descending_and_trailing(spark):
    from graphouse_spark.operators.gapfill import stepped_fill_rows_expr

    rows = [R(10, 8.0, "z"), R(7, 5.0, "y")]
    spec = _espec(desc=True, interpolate=["v"],
                  interpolate_exprs={"v": "v / 2"}, **{"to": 4})
    out = stepped_fill_rows_expr(spark, rows, SCHEMA, spec)
    assert [(r["ts"], r["v"]) for r in out] == [
        (10, 8.0), (9, 4.0), (8, 2.0), (7, 5.0),
        (6, 2.5), (5, 1.25)]  # TO exclusive


def test_interp_expr_multi_column_cross_reference(spark):
    """An expression may reference OTHER columns of the previous
    output row — non-interpolated ones read as their fill defaults
    after the first fill row (exactly what the previous row holds)."""
    from graphouse_spark.operators.gapfill import stepped_fill_rows_expr

    rows = [R(1, 4.0, "q"), R(4, 9.0, "r")]
    spec = _espec(interpolate=["v"],
                  interpolate_exprs={"v": "v + length(tag)"})
    out = stepped_fill_rows_expr(spark, rows, SCHEMA, spec)
    # first fill sees tag='q' (len 1): 5.0; next sees tag='' : 5.0
    assert [(r["ts"], r["v"], r["tag"]) for r in out] == [
        (1, 4.0, "q"), (2, 5.0, ""), (3, 5.0, ""), (4, 9.0, "r")]


def test_interp_expr_router_and_guards(spark):
    from graphouse_spark.operators.gapfill import stepped_fill

    rows = [R(1, 1.0, "a"), R(4, 2.0, "b")]
    spec = _espec(interpolate=["v"], interpolate_exprs={"v": "v + 1"})
    out = stepped_fill(spark, rows, SCHEMA, spec)
    assert [r["v"] for r in out] == [1.0, 2.0, 3.0, 2.0]
    # fill column itself cannot be interpolated
    bad = _espec(interpolate=["ts"], interpolate_exprs={"ts": "ts + 1"})
    with pytest.raises(ValueError, match="cannot be INTERPOLATE"):
        stepped_fill(spark, rows, SCHEMA, bad)
    # the refusal cap still applies before any evaluation
    wide = _espec(interpolate=["v"], interpolate_exprs={"v": "v + 1"},
                  **{"from": 0, "to": 10_000_000})
    with pytest.raises(ValueError, match="WITH FILL would produce"):
        stepped_fill(spark, rows, SCHEMA, wide)
