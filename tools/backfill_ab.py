"""A/B the tag-index backfill growth gate: per-stage breakdown at 1M
and 10M names, under whatever spark.local.dir the session resolves
(set SPARK_GRAFT_LOCAL_DIR=/tmp to force disk). Prints the same
min-of-N task/cpu ratio the scale gate asserts, plus the heaviest
stages so the superlinear component is attributable.

Usage: python tools/backfill_ab.py [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from graphouse_spark.session import get_spark  # noqa: E402
from graphouse_spark.tags import backfill_tag_index  # noqa: E402

LAKES = {
    1_000_000: "/tmp/spark_graft_taglake1m",
    10_000_000: "/tmp/spark_graft_taglake10m",
}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("backfill-ab", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    from bench import _StageMeter

    meter = _StageMeter(spark)
    print(json.dumps({
        "local_dir": spark.conf.get("spark.local.dir", "<default>"),
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }))

    results = {}
    for n, d in LAKES.items():
        out = f"/tmp/tag_backfill_ab_{n}"

        def thunk():
            shutil.rmtree(out, ignore_errors=True)
            shutil.rmtree(out + "_values", ignore_errors=True)
            shutil.rmtree(out + "_metrics", ignore_errors=True)
            backfill_tag_index(spark, d, out)

        thunk()  # warm
        best = None
        for _ in range(repeats):
            snap = meter.max_stage_id()
            t0 = time.perf_counter()
            thunk()
            wall = time.perf_counter() - t0
            stats = meter.since(snap)
            stages = meter.stages_since(snap)
            cur = {"wall": round(wall, 2),
                   "task_sec": stats["task_sec"], "cpu_sec": stats["cpu_sec"],
                   "spill_mb": stats["spill_mb"],
                   "stages": stages}
            if best is None or cur["task_sec"] < best["task_sec"]:
                best = cur
        results[n] = best
        top = sorted(best["stages"], key=lambda s: -s["task_sec"])[:6]
        print(f"== n={n}: wall {best['wall']}s task {best['task_sec']}s "
              f"cpu {best['cpu_sec']}s spill {best['spill_mb']}MB")
        for s in top:
            print("   ", json.dumps(s))
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out + "_values", ignore_errors=True)
        shutil.rmtree(out + "_metrics", ignore_errors=True)

    small, big = results[1_000_000], results[10_000_000]
    print(json.dumps({
        "growth_run": round(big["task_sec"] / small["task_sec"], 2),
        "growth_cpu": round(big["cpu_sec"] / small["cpu_sec"], 2),
        "small": {k: small[k] for k in ("wall", "task_sec", "cpu_sec", "spill_mb")},
        "big": {k: big[k] for k in ("wall", "task_sec", "cpu_sec", "spill_mb")},
    }))


if __name__ == "__main__":
    main()
