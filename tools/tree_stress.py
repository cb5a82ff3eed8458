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
``--lazy`` measures only the LazyMetricTree phases (fast — nothing
eager builds): bootstrap cost, cold/warm glob latency, resident-set
growth for a bounded working set over the same 10M-name namespace,
and DirContentBatcher coalescing under 32 concurrent cold misses.
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


def lazy_main(n: int) -> None:
    """LazyMetricTree envelope over the SAME n-name namespace, served
    by a synthetic loader that derives a directory's children
    arithmetically (zero backing storage — isolates the tree/batcher
    cost from the Spark scan, which the serving path batches via X6).
    """
    import threading

    from graphouse_spark.api.batcher import DirContentBatcher
    from graphouse_spark.tree_index import LazyMetricTree

    hosts = max(1, (n // 10) // 1000)
    calls = {"n": 0}

    def children_of(dir_name: str):
        calls["n"] += 1
        if dir_name == "":
            return [(f"dc{i}.", "SIMPLE") for i in range(10)]
        levels = dir_name.rstrip(".").split(".")
        if len(levels) == 1:
            return [(f"{dir_name}host{h:06d}.", "SIMPLE") for h in range(hosts)]
        if len(levels) == 2:
            return [(f"{dir_name}svc{s:02d}.", "SIMPLE") for s in range(100)]
        return [(f"{dir_name}metric{m}", "SIMPLE") for m in range(10)]

    out = {"target_names": n, "mode": "lazy"}
    base = rss_mb()
    t0 = time.perf_counter()
    tree = LazyMetricTree(children_of)
    out["bootstrap_ms"] = round((time.perf_counter() - t0) * 1000, 3)

    probe_host = f"host{min(123, hosts - 1):06d}"
    t0 = time.perf_counter()
    hits = tree.search(f"dc3.{probe_host}.svc*.metric1")
    out["cold_narrow_glob_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["cold_narrow_glob_hits"] = len(hits)
    out["cold_narrow_loader_calls"] = calls["n"]
    t0 = time.perf_counter()
    tree.search(f"dc3.{probe_host}.svc*.metric1")
    out["warm_narrow_glob_ms"] = round((time.perf_counter() - t0) * 1000, 2)

    # wide glob forcing the host level of one dc: the honest worst case
    # (a lazy tree pays for what a query touches, nothing else)
    calls["n"] = 0
    t0 = time.perf_counter()
    hits = tree.search("dc4.host00000*.svc07.*")
    out["cold_wide_glob_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["cold_wide_glob_hits"] = len(hits)
    out["cold_wide_loader_calls"] = calls["n"]
    t0 = time.perf_counter()
    tree.search("dc4.host00000*.svc07.*")
    out["warm_wide_glob_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["working_set_rss_mb"] = round(rss_mb() - base, 1)

    # batcher coalescing: 32 concurrent cold misses on DISTINCT dirs
    # must aggregate into a few loader calls, not one scan each. The
    # loader sleeps 20 ms to emulate a (batched) metrics-table scan —
    # with an instant loader there is no window to coalesce in, which
    # is also true in production only when scans are free.
    batched = {"n": 0}

    def batch_loader(dirs):
        batched["n"] += 1
        time.sleep(0.02)
        return {d: children_of(d) for d in dirs}

    batcher = DirContentBatcher(batch_loader, max_parallel=2,
                                batch_aggregation_ms=25)
    lazy2 = LazyMetricTree(batcher.load)
    lazy2.search("dc0.host000000.svc00.*")  # force root + spine
    threads = [
        threading.Thread(
            target=lazy2.search,
            args=(f"dc{d}.host{h:06d}.svc{s:02d}.*",))
        for d, h, s in [(i % 10, i % min(32, hosts), i) for i in range(32)]
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out["concurrent_cold_globs"] = 32
    out["concurrent_wall_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["concurrent_loader_calls"] = batched["n"]

    print(json.dumps({"phase": "lazy_summary", **out}), flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--lazy"]
    n = int(args[0]) if args else 10_000_000
    if "--lazy" in sys.argv[1:]:
        lazy_main(n)
        return
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
