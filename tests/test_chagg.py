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
    # per-key c*ln(c) terms round once to integer nano-units (the
    # bit-stable accumulation), so exactness holds to ~1e-9/n
    assert math.isclose(out["g1"], 2.0, abs_tol=1e-8)
    assert math.isclose(out["g2"], 0.0, abs_tol=1e-8)
    assert math.isclose(out["g3"], 1.5, abs_tol=1e-8)


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


# --- round 3: LIMIT BY, bit aggs, moments, interval sweeps, histogram ---

def _df3(spark):
    rows = [("a", 5, 1.0), ("a", 3, 2.0), ("a", 6, 3.0), ("a", 1, 4.0), ("b", 7, 1.0)]
    return spark.createDataFrame(rows, "k string, bits long, v double")


def test_limit_by_per_key(spark):
    from pyspark.sql import functions as F

    from graphouse_spark.functions.chagg import limit_by

    out = limit_by(_df3(spark), ["k"], [F.desc("v"), F.asc("bits")], 2).collect()
    got = {(r["k"], r["v"]) for r in out}
    assert got == {("a", 4.0), ("a", 3.0), ("b", 1.0)}


def test_group_bit_ops(spark):
    from graphouse_spark.functions.chagg import group_bit_ops

    out = {r["k"]: (r["bits_and"], r["bits_or"], r["bits_xor"])
           for r in group_bit_ops(_df3(spark), ["k"], "bits").collect()}
    assert out["a"] == (5 & 3 & 6 & 1, 5 | 3 | 6 | 1, 5 ^ 3 ^ 6 ^ 1)
    assert out["b"] == (7, 7, 7)


def test_moment_stats_hand_math(spark):
    import statistics

    from graphouse_spark.functions.chagg import moment_stats

    # {1,2,3,4}: symmetric -> skew 0; kurtosis = m4/var^2
    out = {r["k"]: r for r in moment_stats(_df3(spark), ["k"], "v").collect()}
    vals = [1.0, 2.0, 3.0, 4.0]
    mu = statistics.fmean(vals)
    var = sum((v - mu) ** 2 for v in vals) / 4
    m4 = sum((v - mu) ** 4 for v in vals) / 4
    assert out["a"]["skew_pop"] == 0.0
    assert out["a"]["kurt_pop"] == pytest.approx(m4 / var**2, abs=1e-6)
    assert out["b"]["skew_pop"] is None  # single point: no variance


def test_corr_perfect_line(spark):
    from graphouse_spark.functions.chagg import corr_stats

    rows = [("g", float(i), float(2 * i + 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = corr_stats(df, ["g"], "x", "y", x_decimals=2, y_decimals=2).collect()[0]
    assert out["corr"] == pytest.approx(1.0, abs=1e-6)
    assert out["covar_pop"] == pytest.approx(2 * (99 / 12), abs=1e-4)  # 2*var(x)


def test_max_intersections_and_cover(spark):
    from graphouse_spark.functions.chagg import interval_length_sum, max_intersections

    iv = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 4), ("g", 3, 6), ("g", 10, 12),
         ("h", 0, 2), ("h", 2, 4)],  # half-open: touching, never overlap
        "g string, s long, e long")
    mi = {r["g"]: (r["max_intersections"], r["max_position"])
          for r in max_intersections(iv, ["g"], "s", "e").collect()}
    assert mi["g"] == (3, 3)
    assert mi["h"] == (1, 0)  # [0,2) closes before [2,4) opens

    cov = {r["g"]: r["union_length"]
           for r in interval_length_sum(iv, ["g"], "s", "e").collect()}
    assert cov["g"] == 5 + 2  # [1,6) u [10,12)
    assert cov["h"] == 4


def test_histogram_fixed_exact_bins(spark):
    from graphouse_spark.functions.chagg import histogram_fixed

    rows = [("g", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["bin"]: (r["n"], r["bin_min"], r["bin_max"])
           for r in histogram_fixed(df, ["g"], "v", 5).collect()}
    assert out == {0: (2, 0.0, 1.0), 1: (2, 2.0, 3.0), 2: (2, 4.0, 5.0),
                   3: (2, 6.0, 7.0), 4: (2, 8.0, 9.0)}


def test_min_max_map_sorted_keys(spark):
    from graphouse_spark.functions.chagg import min_max_map

    out = min_max_map(_df3(spark), ["k"], "bits", "v").collect()
    by_k = {r["k"]: r for r in out}
    assert by_k["a"]["keys"] == [1, 3, 5, 6]
    assert by_k["a"]["min_vals"] == [4.0, 2.0, 1.0, 3.0]
    assert by_k["a"]["max_vals"] == [4.0, 2.0, 1.0, 3.0]


def test_top_k_weighted_global_and_grouped(spark):
    from pyspark.sql import functions as F

    from graphouse_spark.functions.chagg import top_k_weighted

    df = _df3(spark)
    top = top_k_weighted(df, "k", F.col("bits"), 1).collect()
    assert [(r["k"], r["total_weight"]) for r in top] == [("a", 15)]
    grouped = top_k_weighted(df, "bits", F.col("v"), 1, group_cols=["k"]).collect()
    assert {(r["k"], r["bits"]) for r in grouped} == {("a", 1), ("b", 7)}
