"""ClickHouse aggregate-combinator family: sumMap / topK / groupArraySample."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.chagg import approx_top_k, sample_per_group, sum_map


@pytest.fixture()
def kv(spark):
    rows = [
        ("a", "x", 1), ("a", "y", 2), ("a", "x", 3),
        ("b", "y", 5), ("b", "z", 7),
    ]
    return spark.createDataFrame(rows, "g string, k string, v long")


def test_sum_map_keywise_sums_sorted(kv):
    out = {r["g"]: (r["keys"], r["vals"])
           for r in sum_map(kv, ["g"], "k", "v").collect()}
    assert out["a"] == (["x", "y"], [4, 2])
    assert out["b"] == (["y", "z"], [5, 7])


def test_sum_map_matches_flat_groupby(kv):
    """Re-exploding the maps must reproduce the plain (g, k) aggregation."""
    m = sum_map(kv, ["g"], "k", "v")
    back = m.select(
        "g", F.explode(F.arrays_zip("keys", "vals")).alias("p")
    ).select("g", F.col("p.keys").alias("k"), F.col("p.vals").alias("v"))
    flat = kv.groupBy("g", "k").agg(F.sum("v").alias("v"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, flat.collect()))


def test_topk_exact_when_reserve_covers_cardinality(spark):
    # skewed counts: key i appears (i+1)*3 times, 40 distinct keys
    df = spark.range(40).select(
        F.explode(F.sequence(F.lit(0), F.col("id") * 3 + 2)).alias("_"),
        F.col("id").cast("string").alias("k"),
    )
    got = approx_top_k(df, "k", k=5, reserve=1000).collect()
    assert [(r["k"], r["est_count"], r["max_error"]) for r in got] == [
        ("39", 120, 0), ("38", 117, 0), ("37", 114, 0), ("36", 111, 0), ("35", 108, 0),
    ]


def test_topk_bounded_reserve_still_finds_dominant_key(spark):
    """SpaceSaving guarantee: a key with count > N/reserve survives
    truncation in every partition that sees it, and the merged estimate
    never exceeds true count + summed error."""
    heavy = spark.range(500).select(F.lit("hot").alias("k"))
    tail = spark.range(200).select(F.col("id").cast("string").alias("k"))
    df = heavy.union(tail).repartition(8)
    got = approx_top_k(df, "k", k=1, reserve=4).collect()
    assert got[0]["k"] == "hot"
    assert got[0]["est_count"] == 500  # kept everywhere: exact
    # error bound is reported, never understated
    assert got[0]["max_error"] >= 0


def test_sample_per_group_deterministic_across_partitioning(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("i")
    )
    a = sample_per_group(df, ["g"], "i", n=3).collect()
    b = sample_per_group(df.repartition(13), ["g"], "i", n=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_g = {}
    for r in a:
        per_g.setdefault(r["g"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_g.values())


def test_shannon_entropy_hand_math(spark):
    import math

    from graphouse_spark.functions.chagg import shannon_entropy

    # g1: uniform over 4 keys -> 2 bits; g2: one key -> 0 bits;
    # g3: p=(1/2, 1/4, 1/4) -> 1.5 bits
    rows = ([("g1", k) for k in "abcd"] + [("g2", "z")] * 5
            + [("g3", "a"), ("g3", "a"), ("g3", "b"), ("g3", "c")])
    df = spark.createDataFrame(rows, "g string, k string")
    out = {r["g"]: r["entropy_bits"]
           for r in shannon_entropy(df, ["g"], "k").collect()}
    assert math.isclose(out["g1"], 2.0, abs_tol=1e-12)
    assert math.isclose(out["g2"], 0.0, abs_tol=1e-12)
    assert math.isclose(out["g3"], 1.5, abs_tol=1e-12)


def test_delta_sum_counter_semantics(spark):
    from graphouse_spark.functions.chagg import delta_sum

    # counter goes 10 -> 13 -> 2 (reset) -> 7: positive deltas 3 + 5
    rows = [("u", 1, 10), ("u", 2, 13), ("u", 3, 2), ("u", 4, 7)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = delta_sum(df, ["g"], ["t"], "v").collect()
    assert [(r["g"], r["delta_sum"]) for r in got] == [("u", 8)]


def test_mode_per_group_tie_break(spark):
    from graphouse_spark.functions.chagg import mode_per_group

    rows = [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")]
    df = spark.createDataFrame(rows, "g string, k string")
    got = mode_per_group(df, ["g"], "k").collect()
    # a and b tie at 2 -> smallest key wins
    assert [(r["g"], r["mode_key"], r["mode_count"]) for r in got] == [("g", "a", 2)]


def test_common_id_cardinality_pairs(spark):
    from graphouse_spark.functions.chagg import common_id_cardinality

    rows = [("x", 1), ("x", 2), ("x", 2), ("y", 2), ("y", 3), ("z", 9)]
    df = spark.createDataFrame(rows, "g string, i long")
    got = {(r["g1"], r["g2"]): r["common_ids"]
           for r in common_id_cardinality(df, "g", "i").collect()}
    # duplicates collapse (bitmap semantics); disjoint pairs are absent
    assert got == {("x", "y"): 1}


def test_array_cum_diff_flat_rows(spark):
    from graphouse_spark.functions.chagg import array_cum_diff

    rows = [("u", 1, 4), ("u", 2, 1), ("u", 3, 5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    got = sorted(
        (r["idx"], r["val"], r["cum"], r["diff"])
        for r in array_cum_diff(df, ["g"], ["t"], "v").collect()
    )
    assert got == [(1, 4, 4, None), (2, 1, 5, -3), (3, 5, 10, 4)]
