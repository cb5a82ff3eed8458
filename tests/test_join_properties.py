"""Property tests: asof/interval joins vs naive Python reference.

Hypothesis generates small random timelines; the operators (built for
one-shuffle scale) must agree with the obviously-correct quadratic
reference on every instance — edges, ties, duplicates, negatives.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graphouse_spark.operators.asof import asof_join
from graphouse_spark.operators.interval import interval_join

KEYS = ["a", "b"]
times = st.integers(min_value=-50, max_value=50)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


rows_left = st.lists(st.tuples(st.sampled_from(KEYS), times), min_size=1, max_size=8,
                     unique=True)
rows_right = st.lists(st.tuples(st.sampled_from(KEYS), times), min_size=0, max_size=8,
                      unique=True)  # unique (k, t): operator contract (pre-deduped right)


@given(rows_left, rows_right)
@settings(max_examples=25, deadline=None)
def test_asof_matches_naive(sp, left_rows, right_rows):
    left = sp.createDataFrame(left_rows, "k string, t long")
    right = sp.createDataFrame([(k, t, float(t)) for k, t in right_rows],
                               "k string, t long, v double") if right_rows else \
        sp.createDataFrame([], "k string, t long, v double")
    got = {(r["k"], r["t"]): r["v"] for r in asof_join(left, right, "k", "t", "t", ["v"]).collect()}
    for k, t in left_rows:
        cands = [rt for rk, rt in right_rows if rk == k and rt <= t]
        want = float(max(cands)) if cands else None
        assert got[(k, t)] == want, (k, t, got[(k, t)], want)


@given(rows_left, rows_right, st.integers(1, 40), st.integers(0, 40))
@settings(max_examples=25, deadline=None)
def test_interval_matches_naive(sp, left_rows, right_rows, before, after):
    left = sp.createDataFrame(left_rows, "k string, t long")
    right = sp.createDataFrame([(k, t, float(t)) for k, t in right_rows],
                               "k string, t long, v double") if right_rows else \
        sp.createDataFrame([], "k string, t long, v double")
    out = interval_join(left, right, "k", "t", "t", before=before, after=after).collect()
    got = {}
    for r in out:
        got.setdefault((r["k"], r["t"]), set()).add(r["v"])
    for k, t in left_rows:
        want = {float(rt) for rk, rt in right_rows if rk == k and t - before <= rt <= t + after}
        assert got.get((k, t), set()) == want, (k, t)


# ------------------------------------------------------- connected components

edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15))
    .filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=12,
)


def _union_find_components(edges):
    """Obviously-correct reference: path-compressed union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@given(edge_lists)
@settings(max_examples=8, deadline=None)
def test_connected_components_matches_union_find(sp, edges):
    from graphouse_spark.functions.cluster import connected_components

    df = sp.createDataFrame([(int(u), int(v)) for u, v in edges], ["id_a", "id_b"])
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


def test_salted_join_equals_plain_join(spark):
    from graphouse_spark.operators.skew import salted_join
    from pyspark.sql import functions as F

    # hot key: 'k0' carries 90% of the big side
    big = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, "k0")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("k0", "hot"), ("k1", "a"), ("k3", "b"), ("zz", "unmatched")],
        "k string, attr string",
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], how=how).collect()
        want = big.join(small, ["k"], how).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), how


def test_any_join_first_match_deterministic(spark):
    from pyspark.sql import functions as F

    from graphouse_spark.operators.joins import any_join

    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, lv string")
    right = spark.createDataFrame(
        [(1, 30, "late"), (1, 10, "first"), (1, 10, "first-dup"), (2, 5, "only")],
        "k long, ord long, rv string")
    out = {r["k"]: r["rv"] for r in
           any_join(left, right, "k", [F.asc("ord"), F.asc("rv")]).collect()}
    # exactly one right row per key; ties broken by the full order
    assert out == {1: "first", 2: "only", 3: None}
    assert any_join(left, right, "k", [F.asc("ord"), F.asc("rv")]).count() == 3
    # inner strictness drops unmatched left rows
    inner = any_join(left, right, "k", [F.asc("ord"), F.asc("rv")], how="inner")
    assert inner.count() == 2
