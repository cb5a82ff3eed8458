"""One-command full gate (round-9 verdict #4): pytest suite + the
driver-sim oracle mirror + bench, with wall time recorded per phase.

    python tools/gate.py [--skip-bench] [--runs N] [--sample N --seed S]

Phases (each a separate subprocess, so one phase's JVM/session state
can't distort the next — the shared-JVM flake class commit b76e905
documents showed up exactly when ~1000 tests shared one JVM):

  1. pytest-fast   — tests/ minus the @slow e2e marks
  2. pytest-slow   — the @slow marks (spool crash e2e, plugin parity,
                     100x scale gate, ...)
  3. oracle-mirror — tools/driver_sim.py at $SPARK_GRAFT_ORACLE_SF_DIR
                     (default sf0.001; every queries() entry vs its
                     DuckDB oracle, bare session like the driver's;
                     --sample N runs a seeded random subset in the
                     driver's own sampling mode, seed bumped per run)
  4. bench         — python bench.py at $SPARK_GRAFT_SF_DIR (default
                     the driver's sf0.1)

Writes GATE.json beside this script's repo root: per-phase wall
seconds, pass/fail, and the repeated-run stability record when --runs
is >1 (the verdict's "zero flakes in 3 consecutive runs" criterion).
Exit code 0 only when every phase of every run passed.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_phase(name: str, cmd: list[str], env=None) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    wall = round(time.time() - t0, 1)
    tail = proc.stdout[-2000:] if proc.returncode != 0 else \
        "\n".join(proc.stdout.splitlines()[-3:])
    print(json.dumps({"phase": name, "wall_sec": wall,
                      "ok": proc.returncode == 0}), flush=True)
    if proc.returncode != 0:
        print(tail, file=sys.stderr, flush=True)
    return {"phase": name, "wall_sec": wall, "ok": proc.returncode == 0,
            "tail": tail}


def one_run(skip_bench: bool, sample: int | None, seed: int,
            mirror_only: bool = False) -> list[dict]:
    env = dict(os.environ, PYTHONPATH=REPO)
    py = sys.executable
    oracle_sf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                               "/root/testdata/sf0.001")
    if not os.path.isdir(oracle_sf):
        return [{"phase": "oracle-mirror", "wall_sec": 0.0, "ok": False,
                 "tail": f"oracle sf dir {oracle_sf!r} does not exist — "
                         "set SPARK_GRAFT_ORACLE_SF_DIR"}]
    mirror_cmd = [py, "tools/driver_sim.py", oracle_sf]
    if sample is not None:
        mirror_cmd += ["--sample", str(sample), "--seed", str(seed)]
    if mirror_only:
        phases = [("oracle-mirror", mirror_cmd)]
    else:
        phases = [
            ("pytest-fast", [py, "-m", "pytest", "tests/", "-x", "-q",
                             "-m", "not slow", "-p", "no:cacheprovider"]),
            ("pytest-slow", [py, "-m", "pytest", "tests/", "-x", "-q",
                             "-m", "slow", "-p", "no:cacheprovider"]),
            ("oracle-mirror", mirror_cmd),
        ]
        if not skip_bench:
            phases.append(("bench", [py, "bench.py"]))
    return [run_phase(name, cmd, env) for name, cmd in phases]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--runs", type=int, default=1,
                    help="repeat the whole gate N times (flake check)")
    ap.add_argument("--sample", type=int, default=None,
                    help="oracle-mirror: run a seeded random N-subset of "
                         "queries (the driver's sampling mode)")
    ap.add_argument("--seed", type=int, default=0,
                    help="seed for --sample; bumped per run when --runs>1")
    ap.add_argument("--mirror-only", action="store_true",
                    help="run only the oracle-mirror phase (seeded "
                         "sample sweeps without re-running pytest)")
    ap.add_argument("--out", default=None,
                    help="artifact filename (relative to repo root); "
                         "defaults to GATE.json for full-gate runs and "
                         "GATE_SAMPLED.json when --sample/--mirror-only "
                         "is set, so a subset sweep never overwrites "
                         "the round's full-gate evidence record")
    args = ap.parse_args()
    if args.out is None:
        args.out = ("GATE_SAMPLED.json"
                    if args.sample is not None or args.mirror_only
                    else "GATE.json")

    runs = []
    for i in range(args.runs):
        print(f"# gate run {i + 1}/{args.runs}", flush=True)
        runs.append(one_run(args.skip_bench, args.sample, args.seed + i,
                            args.mirror_only))

    ok = all(p["ok"] for run in runs for p in run)
    record = {
        "ok": ok,
        # keep the bench phase's one-line JSON artifact (it is the
        # round's perf record; ok-phase stdout is otherwise dropped)
        "runs": [[dict({k: p[k] for k in ("phase", "wall_sec", "ok")},
                       **({"tail": p["tail"]} if p["phase"] == "bench"
                          else {}))
                  for p in run] for run in runs],
        "failures": [{"run": i, **{k: p[k] for k in ("phase", "tail")}}
                     for i, run in enumerate(runs)
                     for p in run if not p["ok"]],
    }
    if args.sample is not None:
        record["sample"] = {"n": args.sample, "seeds":
                            list(range(args.seed, args.seed + args.runs))}
    with open(os.path.join(REPO, args.out), "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"gate": "done", "ok": ok,
                      "total_wall_sec": round(sum(
                          p["wall_sec"] for run in runs for p in run), 1)}),
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
