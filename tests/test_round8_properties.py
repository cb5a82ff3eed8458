"""Property tests for the round-8/9 additions: OLS invariants,
series-list pairing bijection, LTTB selection laws, bloom membership
(never a false negative, any names)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

values = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False).map(
        lambda v: round(v, 2)),
    min_size=2, max_size=12)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "metric string, ts long, value double")


@given(values)
@settings(max_examples=12, deadline=None)
def test_linreg_line_passes_through_centroid(spark, vs):
    """OLS law: the fitted line passes through (mean x, mean y) — so
    the fitted values' mean equals the data mean, for ANY series."""
    from graphouse_spark.functions.timeseries import linear_regression_line

    df = _mk(spark, [("m", i * 60, v) for i, v in enumerate(vs)])
    got = [r["value"] for r in linear_regression_line(df).collect()]
    assert sum(got) / len(got) == pytest.approx(sum(vs) / len(vs), abs=1e-4)


@given(values, values)
@settings(max_examples=10, deadline=None)
def test_series_lists_sum_diff_inverse(spark, a_vs, b_vs):
    """sumSeriesLists(a,b) - b == a on the shared grid, any inputs."""
    from graphouse_spark.functions.timeseries import series_lists_op

    n = min(len(a_vs), len(b_vs))
    a = _mk(spark, [("a.x", i * 60, v) for i, v in enumerate(a_vs[:n])])
    b = _mk(spark, [("b.x", i * 60, v) for i, v in enumerate(b_vs[:n])])
    s = series_lists_op(a, b, "sum").collect()
    by_ts = {r["ts"]: r["value"] for r in s}
    for i in range(n):
        assert by_ts[i * 60] == pytest.approx(a_vs[i] + b_vs[i], abs=1e-6)


@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=5, max_size=60),
       st.integers(min_value=3, max_value=8))
@settings(max_examples=10, deadline=None)
def test_lttb_selection_laws(spark, vs, buckets):
    """LTTB laws for ANY series: output is a subset of the input,
    endpoints survive, size == min(n_points, n_buckets-ish)."""
    from graphouse_spark.functions.timeseries import lttb_downsample

    rows = [("m", 1000 + i * 60, round(v, 2)) for i, v in enumerate(vs)]
    got = lttb_downsample(_mk(spark, rows), buckets).collect()
    out = {(r["ts"], r["value"]) for r in got}
    src = {(t, v) for _, t, v in rows}
    assert out <= src
    ts = sorted(t for t, _ in out)
    assert ts[0] == rows[0][1] and ts[-1] == rows[-1][1]
    assert len(out) <= max(len(rows), buckets)


metric_names = st.lists(
    st.text(min_size=0, max_size=24), min_size=1, max_size=12, unique=True)


@given(metric_names)
@settings(max_examples=200, deadline=None)
def test_bloom_digest_membership_never_false_negative(names):
    """The pure bloom math: build bits from any unicode name set, then
    every member probes positive at any (m, k) the builder would pick."""
    from graphouse_spark.sources.skipping import _BLOOM_K_MAX, _bloom_digests

    n = max(1, len(names))
    fpp = 0.01
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = min(max(1, round(m / n * math.log(2))), _BLOOM_K_MAX)
    bits = bytearray(m // 8)
    for name in names:
        for d in _bloom_digests(name, k):
            pos = d % m
            bits[pos >> 3] |= 1 << (pos & 7)
    for name in names:
        assert all(
            bits[(d % m) >> 3] & (1 << ((d % m) & 7))
            for d in _bloom_digests(name, k)
        )
