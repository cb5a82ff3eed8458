"""100x scale audit (round-5 verdict item): blow the sf0.1 tables up
100x (10M events / 500k documents), run the core aggregation family,
the dedup/cluster plans, the percentile-band prune and the round-7
serving surface (CH combinators, ARRAY JOIN, seriesByTag resolution,
the fused quality rule-packs), and assert

- task-time grows AT MOST LINEARLY from 10x to 100x data (10x more
  rows must cost <= 10x more executor task-time) — the 1x point is
  pure per-task overhead at these sizes, so growth is measured
  between the two big points. Each query also carries a measured
  BUDGET (round-8 measurement + ~35% headroom, capped at the linear
  bound) so a regression that stays "merely linear" still fails;
- no stage processing real data runs with a single task (a 1-task
  stage is the plan shape that cannot use a cluster).

Wall-clock is recorded but not asserted — this host's ambient load
swings it 1.2-2x; executor task-time is the plan-determined number
(see bench.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

#: measured 10x->100x task-time ratios (round 8): lww 2.8, bucket 1.1,
#: two_level 1.2, sliding 2.8, pctl 4.0, exact_dedup 1.3, clusters 4.2,
#: corpus 5.9, combinators 1.5, array_join 4.4, tagged 8.0, rulepacks
#: 1.4. Budget = measured * ~1.35 headroom, capped at 10.0 (linear).
BUDGETS = {
    "gh_lww_dedup": 3.8,
    "gh_bucket_agg": 1.6,
    "gh_two_level_agg": 1.7,
    "gh_sliding_window": 3.8,
    "ts_remove_between_pctl": 5.4,
    "doc_exact_dedup": 1.8,
    "doc_dedup_clusters": 5.7,
    "doc_corpus_pipeline": 8.1,
    "ev_ch_combinators": 2.1,
    "ev_array_join": 5.9,
    "ev_tagged_series": 10.0,
    "doc_quality_rulepacks": 2.0,
}


@pytest.mark.slow
def test_core_plans_at_most_linear_to_100x(spark):
    import __spark_entry__ as em
    from bench import _StageMeter
    from scale_check import build, run_one

    meter = _StageMeter(spark)
    dirs = {}
    for copies in (10, 100):
        dirs[copies] = f"/tmp/spark_graft_scale{copies}"
        build(spark, copies, dirs[copies])

    qs = em.queries()
    for name, budget in BUDGETS.items():
        fn = qs[name]
        ten = run_one(spark, meter, fn, dirs[10])
        hundred = run_one(spark, meter, fn, dirs[100])
        growth = hundred["task_sec"] / max(ten["task_sec"], 1e-9)
        # 10x the rows: linear = 10x task-time. The per-query budget is
        # the regression tripwire; 10.0 is the hard scalability claim.
        assert growth <= min(budget, 10.0), (
            f"{name}: task-time grew {growth:.1f}x for 10x more data "
            f"({ten['task_sec']}s -> {hundred['task_sec']}s) — budget "
            f"{budget}x, linear bound 10x")
        assert not hundred["one_task_stages"], (
            f"{name}: 1-task stage over real data at 100x: "
            f"{hundred['one_task_stages']}")
