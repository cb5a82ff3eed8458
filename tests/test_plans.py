"""Plan-quality gates: the physical plans we would want at 100 TB.

These assertions pin the *shape* of the plan, not timings: broadcast
joins where one side is dimension-sized, pushed filters at scans,
whole-stage codegen in the hot path. A regression here is a 100x
regression at scale even if local timings barely move.
"""

import contextlib
import io

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q3_broadcasts_dimension(spark):
    plan = plan_of(em.q_tpch_q3(spark, SF))
    assert "BroadcastHashJoin" in plan  # customer side must broadcast
    assert "PushedFilters" in plan


def test_tpch_q5_broadcasts_small_dims(spark):
    plan = plan_of(em.q_tpch_q5(spark, SF))
    # nation/region/supplier are all broadcast-sized
    assert plan.count("BroadcastHashJoin") >= 3


def test_read_path_two_level_agg_shape(spark):
    # dedup + bucket agg: partial/final HashAggregate pairs, exactly two
    # shuffles (one per grouping key change), no Python evaluation
    # (AQE's formatted output hides WholeStageCodegen markers pre-run,
    # so assert the operator shape instead)
    df = em.q_gh_two_level_agg(spark, SF)
    plan = plan_of(df)
    # map-side combine on both levels (the outer avg runs as exact
    # integer sum+count since the engine-portability rewrite)
    assert "partial_max_by" in plan and "partial_sum" in plan
    assert plan.count(") Exchange") <= 2  # detail headers: one per exchange
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scan_prunes_columns(spark):
    # lineitem has 11 columns; q1 must read only the 7 it uses
    plan = plan_of(em.q_tpch_q1(spark, SF))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema


def test_no_python_in_core_queries(spark):
    # every graphouse-core query runs JVM-side end to end
    for name in ["gh_lww_dedup", "gh_bucket_agg", "gh_gap_fill", "gh_glob_filter"]:
        plan = plan_of(em.queries()[name](spark, SF))
        assert "EvalPython" not in plan, f"{name} fell back to Python"


def test_bucketed_table_joins_without_shuffle(spark, tmp_path):
    """bucketBy(metric) persists the clustering: a self-join and a
    groupBy on the bucket key must run with zero Exchange operators."""
    from pyspark.sql import functions as F

    from graphouse_spark.sources.tables import write_data_bucketed
    from tests.test_read_path import make_data

    # (warehouse dir is a static conf — the default ./spark-warehouse is
    # used; the table is dropped below and the dir is gitignored)
    rows = [(f"m.grp{i % 5}.x", float(i), 1_542_199_500 + i, 1) for i in range(1000)]
    write_data_bucketed(make_data(spark, rows), "bucketed_data", n_buckets=8)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        t = spark.table("bucketed_data")
        agg = t.groupBy("metric").agg(F.avg("value"))
        assert ") Exchange" not in plan_of(agg), "bucketed groupBy must not shuffle"
        # force a non-broadcast join so the bucketing (not a broadcast)
        # is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = t.alias("a").join(spark.table("bucketed_data").alias("b"), "metric")
        jplan = plan_of(joined)
        assert ") Exchange" not in jplan, "bucketed equi-join must not shuffle"
        assert "SortMergeJoin" in jplan or "ShuffledHashJoin" in jplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS bucketed_data")


def test_asof_join_single_exchange(spark):
    """The union-merge as-of join must cost exactly one data shuffle
    (the window's hashpartitioning on the join key) for pre-deduped
    inputs — the property that makes it viable at 100 TB."""
    left = spark.createDataFrame([("a", 10)], "k string, t long")
    right = spark.createDataFrame([("a", 8, 1.0)], "k string, t long, v double")
    from graphouse_spark.operators.asof import asof_join

    plan = plan_of(asof_join(left, right, "k", "t", "t", ["v"]))
    assert plan.count(") Exchange") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_interval_join_is_equi_join(spark):
    """The bucketed range join must plan as a hash/sort-merge equi-join
    with the range as a residual filter — never a nested-loop."""
    plan = plan_of(em.q_interval_click_density(spark, SF))
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan and "_iv_bucket" in plan


def test_hash_sampling_filters_in_scan_stage(spark):
    # deterministic sampling is a pure filter: no shuffle, no Python
    plan = plan_of(em.q_doc_hash_sample(spark, SF))
    assert ") Exchange" not in plan
    assert "EvalPython" not in plan
    plan = plan_of(em.q_doc_stratified_sample(spark, SF))
    assert ") Exchange" not in plan


def test_tfidf_explodes_corpus_exactly_once(spark):
    # r14: df is a count WINDOW over tf, not an aggregate joined back —
    # the join-back form put tf on both sides of a self-join and the
    # whole scan→explode subtree was physically duplicated (no exchange
    # reuse under AQE). The corpus must be exploded exactly once; the
    # only join left is the broadcast n_docs cross join.
    plan = plan_of(em.q_doc_tfidf_topk(spark, SF))
    # each physical node appears twice in formatted output (tree line +
    # "(n) Generate" detail header): one Generate node == 2 mentions
    assert plan.count("Generate") == 2, plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan


def test_highest_max_semi_join_broadcasts(spark):
    plan = plan_of(em.q_ts_highest_max(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # top-N must be the distributed heap-merge, not a global window
    assert "TakeOrderedAndProject" in plan and "Window" not in plan


def test_simhash_pairs_is_equi_join(spark):
    # banded LSH must plan an equi-join on (band, key) — a nested-loop
    # pair comparison would be the n^2 disaster at scale
    plan = plan_of(em.q_doc_simhash_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
