"""Per-stage profile + plan capture for one or more declared queries.

Usage: python tools/profile_query.py <query> [<query>...] [--sf SF_DIR]
                                      [--plans-out DIR] [--runs N]

For each query: warm run (codegen/JIT), then N timed runs; prints wall,
per-stage task_sec/input/shuffle, and (with --plans-out) writes the
``explain("formatted")`` text to ``<dir>/<query>.txt``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _StageMeter  # noqa: E402
from graphouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("graphouse-profile")
    spark.sparkContext.setLogLevel("ERROR")
    meter = _StageMeter(spark)
    queries = entry_mod.queries()

    for name in args.queries:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, args.sf)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        df.count()  # warm: codegen + JIT
        best_wall, best_stages, n = float("inf"), None, 0
        for _ in range(args.runs):
            spark.catalog.clearCache()
            snap = meter.max_stage_id()
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            wall = time.perf_counter() - t0
            meter.since(snap)  # let the listener settle
            stages = meter.stages_since(snap)
            if wall < best_wall:
                best_wall, best_stages = wall, stages
        total_task = sum(s["task_sec"] for s in best_stages)
        print(f"\n== {name}: wall {best_wall:.3f}s, task {total_task:.2f}s, "
              f"{len(best_stages)} stages, {n} rows")
        for s in sorted(best_stages, key=lambda s: -s["task_sec"]):
            print(f"   stage {s['stage_id']:>5} tasks={s['num_tasks']:>3} "
                  f"task={s['task_sec']:7.2f}s input={s['input_mb']:8.2f}MB "
                  f"shufR={s['shuffle_read_mb']:8.2f}MB")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
