"""Growth-ratio scale gate for the round-10 tag-index plans
(round-10 verdict #1): the slice-intersection seriesByTag evaluator,
the distinct-values sub-index ``=~`` rewrite (IN-list path AND the
over-cap rlike fallback), the all-negative conditional-aggregation
shape, and the backfill index build were envelope-measured (warm 10M,
tools/tag_stress.py) but never growth-gated. This test builds 1M- and
10M-name fixtures (cached in /tmp across runs — the 10M index build
costs ~3 min once) and asserts, per plan:

- 10x more names cost at most BUDGETx more executor work, gated on
  min(runTime growth, cpuTime growth) like tests/test_scale_100x.py
  (noise inflates one metric, a real plan regression inflates both),
  with the same <=30s-task escape hatch (a few-second small-side
  sample is JIT-state noise);
- no stage processing real data runs with a single task — the exact
  trap that killed the round-9 tag design (a per-name map compile
  pushed into a 1-2-split scan stage).

Budgets = quiet-box observed ratio * ~1.5 headroom, capped at the
10.0 linear bound. r11 calibration observed (min-of-2 per size):
eq+regex 5.5, regex-IN-list 5.2, over-cap fallback 1.7 (sub-linear —
the literal-prefix bound prunes more row groups at scale),
all-negative eq 5.1, all-negative regex 8.2 — which with headroom
ships as the SHAPES budgets 8.5 / 8.0 / 4.0 (extra slack: the
sub-linear ratio's denominator is a sub-second sample) / 8.0 / 10.0
(capped). Backfill sits AT the
linear cap: per-row cpu is flat (6.4 -> 6.9 us/row — the sort's log
factor), so min(run, cpu) lands 9.5-10x and the observed*1.5 formula
under-budgets whenever the small-side sample is lucky (a 30 vs 50 s
small side moved the ratio 5.6 -> 9.5 on identical code); its budget
is the 10.0 linear claim itself. (The r11 fix that made this linear:
the localCheckpoint of exploded rows cost 17-23x cpu for 10x names
and was replaced by deriving count + sub-index from the written
parquet.) Over-bound measurements re-measure once before failing —
the same confirm-before-fail protocol as test_scale_100x.
"""

import json
import os
import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SIZES = {
    1_000_000: "/tmp/spark_graft_tags1m",
    10_000_000: "/tmp/spark_graft_tags10m",
}
LAKES = {
    1_000_000: "/tmp/spark_graft_taglake1m",
    10_000_000: "/tmp/spark_graft_taglake10m",
}

#: term-set shapes gated (exercised through the full service path,
#: sub-index rewrite hook included)
SHAPES = {
    "eq_plus_regex": (["datacenter=dc1", "rack=~r1.*"], 8.5),
    "regex_lowcard_inlist": (["rack=~r1?[13].*"], 8.0),
    "regex_overcap_fallback": (["host=~h1.*"], 4.0),
    "all_negative_eq": (["datacenter!=dc1"], 8.0),
    "all_negative_regex": (["host!=~h1.*"], 10.0),
    # round-11 verdict #2: the two remaining term shapes. Tag-present
    # (`k!=`) is a positive single-slice distinct; tag-absent (`k=`)
    # is the all-negative universe-minus-slice shape — REFUSED by the
    # service by default (graphite-web's own posture), gated here
    # under the opt-in because the evaluator still ships.
    # r13 calibration (task_sec, warm), on the anti-join-over-
    # distinct-metric-slice plan (r12 verdict #3; warm 10M WALL for
    # tag_absent dropped 3.0 -> 1.6 s): tag_present 4.5 -> 21.5 s
    # (4.8x), tag_absent 3.2 -> 22.9 s (7.1x); budgets observed*1.5
    # capped at the linear bound.
    "tag_present": (["rack!="], 8.0),
    "tag_absent": (["datacenter="], 10.0),
}
BACKFILL_BUDGET = 10.0

#: round-12 verdict #4: the sub-index-ABSENT degraded window (after a
#: crashed backfill the ``=~``/``!=~`` shapes run without the IN-list
#: rewrite — "correct, slower" needs a number and a budget). Measured
#: through the same service path with the distinct-values lookup
#: returning None (exactly what read_tag_values answers while the
#: sub-index is absent). r13 calibration (task_sec, warm): low-card
#: regex 4.0 -> 16.9 s (4.2x), negated regex 5.6 -> 27.1 s (4.9x);
#: budgets observed*1.5.
DEGRADED_SHAPES = {
    "regex_lowcard_subindex_absent": (["rack=~r1?[13].*"], 6.5),
    "regex_negated_subindex_absent": (["host!=~h1.*"], 7.5),
}


def _ensure_index(spark, n: int, d: str) -> None:
    marker = f"{d}/_N_NAMES"
    if os.path.exists(f"{d}/tags/_SUCCESS"):
        if not os.path.exists(marker):  # stamp pre-marker fixtures
            with open(marker, "w") as fh:
                fh.write(str(n))
        if not os.path.exists(f"{d}/tags_metrics/_SUCCESS"):
            # pre-r13 fixture: derive the distinct-metric universe
            # slice the all-negative plans now serve from (without it
            # the gate would silently measure the fallback plan)
            from pyspark.sql import functions as F

            from graphouse_spark.schemas import TAGS_SCHEMA
            from graphouse_spark.sources.tables import TAG_VALUES_FILES

            rows = spark.read.schema(TAGS_SCHEMA).parquet(f"{d}/tags")
            (rows.filter(F.col("tag") == "name").select("metric", "date")
                 .repartition(TAG_VALUES_FILES, "metric")
                 .sortWithinPartitions("metric")
                 .write.mode("overwrite").parquet(f"{d}/tags_metrics"))
        return
    from tag_stress import build_index

    build_index(spark, n, f"{d}/tags")
    # the same reuse marker tools/tag_stress.py checks, so its warm
    # measurements can run against this suite's fixtures
    with open(marker, "w") as fh:
        fh.write(str(n))


def _ensure_lake(spark, n: int, d: str) -> None:
    if os.path.exists(f"{d}/_SUCCESS"):
        return
    from pyspark.sql import functions as F

    rows = spark.range(n).select(
        F.concat(
            F.lit("srv.metric"), (F.col("id") % 997).cast("string"),
            F.lit(".used;datacenter=dc"), (F.col("id") % 13).cast("string"),
            F.lit(";host=h"), F.col("id").cast("string"),
            F.lit(";rack=r"), (F.col("id") % 211).cast("string"),
        ).alias("metric"),
        F.lit(1.0).alias("value"),
        F.lit(1_700_000_000).cast("long").alias("timestamp"),
        F.to_date(F.lit("2023-11-14")).alias("date"),
        F.lit(1_700_000_000).cast("long").alias("updated"))
    (rows.repartition(32).write.mode("overwrite")
     .partitionBy("date").parquet(d))


def _run_one(meter, thunk, repeats: int = 2) -> dict:
    """Warm once, min-of-N — the scale_check.run_one protocol for a
    thunk that drives a full service call instead of a DataFrame."""
    thunk()
    best = None
    for _ in range(repeats):
        snap = meter.max_stage_id()
        thunk()
        stats = meter.since(snap)
        stages = meter.stages_since(snap)
        narrow = [s for s in stages
                  if s["num_tasks"] == 1
                  and (s["input_mb"] + s["shuffle_read_mb"]) > 64]
        cur = {"task_sec": stats["task_sec"], "cpu_sec": stats["cpu_sec"],
               "spill_mb": stats["spill_mb"], "one_task_stages": narrow}
        if best is None or cur["task_sec"] < best["task_sec"]:
            best = cur
    return best


def _gate(name: str, small: dict, big: dict, budget: float,
          remeasure=None) -> None:
    g_run = big["task_sec"] / max(small["task_sec"], 1e-9)
    g_cpu = big["cpu_sec"] / max(small["cpu_sec"], 1e-9)
    growth = min(g_run, g_cpu)
    # same escape hatch as test_scale_100x: a <=30s big side means the
    # ratio's denominator is a few-second JIT-noise sample — loosen to
    # 30x (a quadratic plan still trips it) instead of asserting noise
    effective = min(budget, 10.0) if big["task_sec"] > 30.0 else 30.0
    if growth > effective and remeasure is not None:
        # confirm-before-fail (test_scale_100x protocol): one fresh
        # re-measure of both sizes — the flake class is a small-side
        # sample distorted by accumulated in-suite JVM state; a real
        # plan regression reproduces
        small, big = remeasure()
        g_run = big["task_sec"] / max(small["task_sec"], 1e-9)
        g_cpu = big["cpu_sec"] / max(small["cpu_sec"], 1e-9)
        growth = min(g_run, g_cpu)
        effective = min(budget, 10.0) if big["task_sec"] > 30.0 else 30.0
    assert growth <= effective, (
        f"{name}: grew {g_run:.1f}x runTime / {g_cpu:.1f}x cpu for 10x "
        f"more names ({small['task_sec']}s -> {big['task_sec']}s run, "
        f"{small['cpu_sec']}s -> {big['cpu_sec']}s cpu) — bound "
        f"{effective}x (budget {budget}x, linear 10x)")
    assert not big["one_task_stages"], (
        f"{name}: 1-task stage over real data at 10M: "
        f"{big['one_task_stages']}")


@pytest.mark.slow
def test_tag_index_plans_at_most_linear_10x(spark):
    from bench import _StageMeter
    from graphouse_spark.api.service import GraphouseService

    meter = _StageMeter(spark)
    svcs = {}
    for n, d in SIZES.items():
        _ensure_index(spark, n, d)
        svc = GraphouseService(spark, f"{d}/data", f"{d}/metrics",
                               tags_path=f"{d}/tags",
                               allow_all_negative_tag_queries=True)
        svc.tag_lookback_days = 36500  # fixture dates are synthetic
        svcs[n] = svc

    results = {}
    for shape, (exprs, budget) in SHAPES.items():
        per_size = {}
        for n in SIZES:
            svc = svcs[n]
            per_size[n] = _run_one(
                meter, lambda: svc._tagged_names(exprs).count())
        small, big = per_size[1_000_000], per_size[10_000_000]

        def remeasure(exprs=exprs):
            # alternating-pairs confirm-before-fail (r14, second
            # hardening iteration — see scale_check.paired_remeasure:
            # bracketing probes miss drift that begins INSIDE the big
            # side's measured region; adjacent pairs divide out any
            # box-wide multiplicative state, min-growth pair
            # adjudicates, a real superlinear plan fails every pair)
            from scale_check import paired_remeasure

            return paired_remeasure(
                svcs[1_000_000].spark, meter,
                lambda: _run_one(
                    meter,
                    lambda: svcs[1_000_000]._tagged_names(exprs).count(),
                    repeats=1),
                lambda: _run_one(
                    meter,
                    lambda: svcs[10_000_000]._tagged_names(exprs).count(),
                    repeats=1))

        _gate(shape, small, big, budget, remeasure)
        results[shape] = {n: r["task_sec"] for n, r in per_size.items()}

    # degraded window (r12 verdict #4): the same gate with the
    # distinct-values rewrite hook answering None — the exact
    # service-path behavior while a crashed backfill has left the
    # sub-index absent
    for shape, (exprs, budget) in DEGRADED_SHAPES.items():
        per_size = {}
        for n in SIZES:
            svc = svcs[n]
            svc._regex_value_list = lambda key, anchored, lookback=True: None
            try:
                per_size[n] = _run_one(
                    meter, lambda: svc._tagged_names(exprs).count())
            finally:
                del svc.__dict__["_regex_value_list"]
        small, big = per_size[1_000_000], per_size[10_000_000]

        def remeasure(exprs=exprs):
            # alternating-pairs confirm-before-fail (r14, second
            # hardening iteration — see the gate above and
            # scale_check.paired_remeasure), with the degraded-window
            # hook installed around each measurement
            from scale_check import paired_remeasure

            def measure(n):
                svc = svcs[n]
                svc._regex_value_list = (
                    lambda key, anchored, lookback=True: None)
                try:
                    return _run_one(
                        meter,
                        lambda: svcs[n]._tagged_names(exprs).count(),
                        repeats=1)
                finally:
                    del svc.__dict__["_regex_value_list"]

            return paired_remeasure(
                svcs[1_000_000].spark, meter,
                lambda: measure(1_000_000),
                lambda: measure(10_000_000))

        _gate(shape, small, big, budget, remeasure)
        results[shape] = {n: r["task_sec"] for n, r in per_size.items()}
    print(json.dumps({"tag_plan_task_sec": results}))


@pytest.mark.slow
def test_tag_backfill_at_most_linear_10x(spark):
    from bench import _StageMeter
    from graphouse_spark.tags import backfill_tag_index

    meter = _StageMeter(spark)

    def thunk_for(n):
        d, out = LAKES[n], f"/tmp/tag_backfill_gate_{n}"

        def thunk():
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out + "_values", ignore_errors=True)
            backfill_tag_index(spark, d, out)

        return thunk

    per_size = {}
    for n, d in LAKES.items():
        _ensure_lake(spark, n, d)
        per_size[n] = _run_one(meter, thunk_for(n))
    small, big = per_size[1_000_000], per_size[10_000_000]

    def remeasure():
        # alternating-pairs confirm-before-fail (r14, second hardening
        # iteration): observed in-suite trips at 11.0-30.0x with task
        # AND cpu inflated TOGETHER while isolated reruns passed well
        # under budget — sustained-load box throttling, which
        # bracketing probes miss when the shift begins inside the big
        # side's measured region. Adjacent pairs divide the box state
        # out; a real superlinear plan fails every pair
        # (scale_check.paired_remeasure).
        from scale_check import paired_remeasure

        return paired_remeasure(
            spark, meter,
            lambda: _run_one(meter, thunk_for(1_000_000), repeats=1),
            lambda: _run_one(meter, thunk_for(10_000_000), repeats=1))

    _gate("backfill_tag_index", small, big, BACKFILL_BUDGET, remeasure)
    # the r11 finding was spill-shaped before it was ratio-shaped: keep
    # a spill tripwire at 40M index rows (the localCheckpoint bug
    # spilled 326 MB; a small in-suite sort spill under shared-JVM heap
    # pressure is tolerated)
    assert big["spill_mb"] < 64, big
    for n in LAKES:
        shutil.rmtree(f"/tmp/tag_backfill_gate_{n}", ignore_errors=True)
        shutil.rmtree(f"/tmp/tag_backfill_gate_{n}_values",
                      ignore_errors=True)
