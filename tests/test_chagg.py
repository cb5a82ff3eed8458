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
