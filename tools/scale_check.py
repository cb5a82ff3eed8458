"""Scale-up audit: do the core plans survive a 10x-100x data blow-up?

Builds an N-copy blow-up of the sf0.1 events/documents/embeddings
tables in /tmp (crossJoin with a copy index — one plan regardless of
N; 100 copies of events = 10M rows), then runs the core aggregation
family, the dedup/cluster plans and the percentile-band prune at 1x
vs Nx, recording WALL and EXECUTOR TASK-TIME per run (wall on this
host is noise-bound; task-time is the plan-determined number) plus a
per-stage audit: any stage with one task processing real data is a
scale-killer and fails the check.

Copy semantics:
- events: event_id/user_id re-keyed per copy — same distributions,
  N x the rows, N x the users.
- documents: every WORD gets a per-copy suffix, so shingles differ
  across copies and the near-dup / clustering profile stays the
  original one repeated N times (a verbatim copy would give every doc
  N-1 exact twins — a quadratic candidate blow-up that measures the
  synthetic profile, not the plan).
- embeddings: re-keyed verbatim (ANN cost is corpus x queries,
  profile-independent).

A healthy plan grows roughly linearly (shuffle-bound) in task-time,
never quadratically, and keeps every data-bearing stage parallel.

Usage: python tools/scale_check.py [copies] [--json]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
import __spark_entry__ as em  # noqa: E402
from bench import _StageMeter  # noqa: E402
from graphouse_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"

#: the 100x basket the round-5 verdict asked for: core agg family +
#: the two dedup/cluster plans + the percentile-band prune
QUERIES = [
    "gh_lww_dedup", "gh_bucket_agg", "gh_two_level_agg",
    "gh_sliding_window", "gh_distinct_users", "gh_percentiles",
    "ts_remove_between_pctl",
    "doc_exact_dedup", "doc_minhash_np",
    "doc_dedup_clusters", "doc_corpus_pipeline",
    # round-7 serving surface (round-8 verdict item #3)
    "ev_ch_combinators", "ev_array_join", "ev_tagged_series",
    "doc_quality_rulepacks",
]


def multiply(df, copies: int, keys: dict[str, int]):
    """N logical copies via one crossJoin with a copy index: each key
    column k re-keys as ``k * copies + copy`` (collision-free), other
    columns repeat. One plan node regardless of N."""
    c = df.sparkSession.range(copies).withColumnRenamed("id", "_c")
    out = df.crossJoin(F.broadcast(c))
    for k in keys:
        out = out.withColumn(k, F.col(k) * copies + F.col("_c"))
    return out


def build(spark, copies: int, out_dir: str) -> None:
    import os

    # fixture reuse, keyed on the copy count the blow-up was built
    # with (the tag_stress _N_NAMES discipline): the 100x build costs
    # minutes and several tests in one slow run call build() for the
    # same sizes. The marker is written LAST, so a partial build
    # (crash mid-write) rebuilds rather than serving half the tables.
    marker = f"{out_dir}/_COPIES"
    if os.path.exists(marker):
        if open(marker).read() == str(copies):
            return
        # different size requested: invalidate BEFORE rewriting any
        # table — a crash mid-rebuild must not leave the old marker
        # validating a fixture whose tables mix two sizes
        os.remove(marker)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    (multiply(ev, copies, {"event_id": copies, "user_id": copies})
     .drop("_c").repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/events.parquet"))

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    big = multiply(docs, copies, {"doc_id": copies})
    # word-level copy suffix: shingles/minhashes differ across copies,
    # preserving the original near-dup profile N times over
    big = big.withColumn(
        "text",
        F.regexp_replace(
            F.col("text"), r"(\w+)",
            F.concat(F.lit("$1c"), F.col("_c").cast("string"))),
    )
    (big.drop("_c").repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet"))

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    (multiply(emb, copies, {"vec_id": copies})
     .drop("_c").repartition(32)
     .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet"))
    with open(marker, "w") as fh:
        fh.write(str(copies))


def host_probe(spark, meter, rows: int = 40_000_000) -> dict:
    """Fixed-work host-state probe (the bench.py calib protocol,
    r13 verdict #1 hardening): a parallel xxhash64 fold whose task/cpu
    time measures the box's CURRENT parallel throughput. Gate
    remeasures bracket each size's measurement with this probe and
    normalize by its drift, so a uniformly-distorted box — the
    observed in-suite flake class, where task AND cpu inflate together
    after ~30 min of suite in one shared JVM (or this VM's CPU
    allocation visibly drifts between minutes) — no longer reads as
    plan growth. A REAL superlinear plan inflates the measured side
    far beyond any probe drift, and the correction is clamped to
    [1/3, 3] so the gate cannot be normalized past a quadratic
    regression."""
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism
    best = None
    for _ in range(2):
        snap = meter.max_stage_id()
        # mask to 28 bits before summing: 40M * 2^28 < 2^63, so the
        # ANSI-mode sum cannot overflow (a raw xxhash64 sum throws
        # ARITHMETIC_OVERFLOW under Spark 4's default ansi=true)
        spark.range(rows, numPartitions=par).select(
            F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFFFFF)))).collect()
        s = meter.since(snap)
        if best is None or s["cpu_sec"] < best["cpu_sec"]:
            best = s
    return best


def probe_scaled(big: dict, probe_small: dict, probe_big: dict) -> dict:
    """Scale the big side's task/cpu by the probe drift measured
    around the two sides (see :func:`host_probe`)."""
    out = dict(big)
    for k in ("task_sec", "cpu_sec"):
        f = probe_small[k] / max(probe_big[k], 1e-9)
        f = min(3.0, max(1.0 / 3.0, f))
        out[k] = round(big[k] * f, 3)
    return out


def paired_remeasure(spark, meter, measure_small, measure_big,
                     pairs: int = 3):
    """Alternating-pairs confirm-before-fail (r14 gate hardening,
    second iteration).

    The bracketing-probe protocol (:func:`host_probe` /
    :func:`probe_scaled`) corrects throughput drift measured BEFORE
    each side, but a shift that begins INSIDE the big side's measured
    region escapes it: one in-suite trip on an otherwise-idle box read
    26x run / 30x cpu on a plan that had passed the identical gate 40
    minutes earlier in the previous full-suite run (this VM throttles
    under sustained multi-core load — task and cpu inflate TOGETHER,
    and the same run's calib probes had already drifted 1.4x).

    Alternating small/big pairs make each growth ratio's numerator
    and denominator temporally ADJACENT, so any box-wide
    multiplicative state — throttled or not — divides out of every
    pair that lands in a steady state; the gate adjudicates on the
    min-growth pair. A REAL superlinear plan inflates the big side of
    EVERY pair by the plan's growth factor, so the min still fails.
    Probes still bracket each pair (clamped [1/3, 3]) for the
    within-pair drift they can see.

    ``measure_small`` / ``measure_big`` are zero-arg callables
    returning a stats dict with at least ``task_sec`` and ``cpu_sec``
    (e.g. a ``run_one`` / ``_run_one`` closure). Returns the
    (small, probe-scaled big) of the min-growth pair, ready for the
    caller's existing ratio recomputation."""
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    best = None
    for _ in range(pairs):
        pr_s = host_probe(spark, meter)
        small = measure_small()
        pr_b = host_probe(spark, meter)
        big = probe_scaled(measure_big(), pr_s, pr_b)
        g = min(big["task_sec"] / max(small["task_sec"], 1e-9),
                big["cpu_sec"] / max(small["cpu_sec"], 1e-9))
        if best is None or g < best[0]:
            best = (g, small, big)
    return best[1], best[2]


def run_one(spark, meter, fn, sf_dir: str, repeats: int = 2) -> dict:
    """Warm once, then min-of-N timed runs — the same noise-robust
    estimator bench.py uses: executorRunTime is only plan-determined
    when tasks aren't preempted, and single-run ratios between two
    sizes compound the noise of BOTH samples (a round-9 gate flake:
    an unluckily-fast small-size sample pushed a 1.2-1.6x growth past
    its 1.6x budget)."""
    fn(spark, sf_dir).count()  # warm/compile
    best = None
    for _ in range(repeats):
        spark.catalog.clearCache()
        snap = meter.max_stage_id()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        stats = meter.since(snap)
        stages = meter.stages_since(snap)
        # a 1-task stage over real data cannot use the cluster
        narrow = [s for s in stages
                  if s["num_tasks"] == 1
                  and (s["input_mb"] + s["shuffle_read_mb"]) > 64]
        cur = {"rows": n, "wall": round(wall, 2),
               "task_sec": stats["task_sec"],
               "cpu_sec": stats["cpu_sec"],
               "shuffle_write_mb": stats["shuffle_write_mb"],
               "spill_mb": stats["spill_mb"],
               "one_task_stages": narrow}
        if best is None or cur["task_sec"] < best["task_sec"]:
            best = cur
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if args else 10
    as_json = "--json" in sys.argv
    out_dir = f"/tmp/spark_graft_scale{copies}"
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    meter = _StageMeter(spark)
    t0 = time.perf_counter()
    build(spark, copies, out_dir)
    build_sec = round(time.perf_counter() - t0, 1)

    qs = em.queries()
    results = {}
    if not as_json:
        print(f"# build {copies}x: {build_sec}s")
        print(f"{'query':24s} {'wall1x':>7s} {'wallNx':>7s} "
              f"{'task1x':>7s} {'taskNx':>7s} {'t-ratio':>8s}")
    for name in QUERIES:
        fn = qs[name]
        small = run_one(spark, meter, fn, BASE)
        big = run_one(spark, meter, fn, out_dir)
        ratio = big["task_sec"] / max(small["task_sec"], 1e-9)
        results[name] = {"small": small, "big": big,
                         "task_ratio": round(ratio, 1)}
        if not as_json:
            flag = (" !! 1-task stage" if big["one_task_stages"] else "")
            print(f"{name:24s} {small['wall']:7.2f} {big['wall']:7.2f} "
                  f"{small['task_sec']:7.2f} {big['task_sec']:7.2f} "
                  f"{ratio:7.1f}x{flag}")
    if as_json:
        print(json.dumps({"copies": copies, "build_sec": build_sec,
                          "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
