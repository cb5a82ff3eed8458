"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship as cluster defaults (AQE on, shuffle partitions
sized to cores, Arrow for the pandas paths, UTC everywhere — the
reference's date column derivation is timezone-dependent, we pin UTC
and document the delta; see SURVEY §7 risk register / C11).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Size the local-mode JVM heap from the machine, not a constant.

    In ``local[N]`` the driver heap IS the whole cluster: every
    executor thread's shuffle buffers, broadcast blocks, and codegen
    cache live in one JVM. An 8g heap on a 32-core box sends a long
    benchmark session into GC collapse (measured: the same 20-query
    basket ran 15.4 s with a 32g heap vs 63.8 s with 8g — untouched
    plans slowed 4-15x purely from old-gen churn). Use a third of
    physical RAM, clamped to [8g, 48g]; SPARK_GRAFT_DRIVER_MEM
    overrides.
    """
    try:
        with open("/proc/meminfo") as fh:
            total_kb = int(fh.readline().split()[1])
        gb = total_kb // (1024 * 1024)
    except Exception:
        gb = 24
    return f"{max(8, min(48, gb // 3))}g"


def _default_local_dir() -> str | None:
    """Shuffle/spill scratch space (``spark.local.dir``).

    Production clusters point this at fast local SSDs; this sandbox's
    /tmp sits on a slow virtio disk where creating one shuffle file
    costs ~3 ms — a trivial 32x32-task exchange burned 8 s of executor
    task time in DiskBlockObjectWriter.initialize/copyFileStreamNIO
    (thread-dump-sampled), and the 10M-name tag backfill lost ~20% to
    it. tmpfs is the machine's actual fast local storage: the same
    probes measure 0.38 s (trivial exchange, with the sort writer) and
    -21% task time (10M backfill). Used only when /dev/shm exists with
    generous headroom; SPARK_GRAFT_LOCAL_DIR overrides, unset leaves
    Spark's default. Shuffle dirs are per-application (blockmgr-UUID)
    and removed on session stop; periodic context GC (30 min default)
    bounds accumulation within long sessions.

    Failure mode (documented per r13 ADVICE): tmpfs pages compete with
    the page cache and executor heap for physical RAM, and a shuffle
    larger than the remaining tmpfs space fails the task with ENOSPC —
    Spark has no per-local-dir quota, so the guard is conservative
    instead: tmpfs is used only when /dev/shm has >= 32 GiB free AND
    that free space is at least half of physical RAM (i.e. the machine
    is not already memory-pressured and tmpfs is sized like this
    sandbox's, not a default 50%-of-small-RAM mount). The r14 A/B at
    the 10M-name backfill envelope (tools/backfill_ab.py, round notes)
    measured tmpfs faster at BOTH sizes and BETTER on cpu-growth than
    /tmp, so the risk trade is paid for; set SPARK_GRAFT_LOCAL_DIR to
    any path (e.g. /tmp) to force disk.
    """
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override or None
    try:
        st = os.statvfs("/dev/shm")
        free = st.f_bavail * st.f_frsize
        with open("/proc/meminfo") as fh:
            total_ram = int(fh.readline().split()[1]) * 1024
        if free >= 32 * 1024 ** 3 and free >= total_ram // 2:
            return "/dev/shm/graphouse-spark-local"
    except (OSError, ValueError, IndexError):
        pass
    return None


def _worker_pythonpath() -> str:
    """PYTHONPATH for Python workers/daemon: the directory containing
    this package (so ``graphouse_spark`` imports regardless of the
    driver's cwd) prepended to any inherited PYTHONPATH."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inherited = os.environ.get("PYTHONPATH", "")
    return f"{pkg_root}:{inherited}" if inherited else pkg_root


def _install_fast_function_lookup() -> None:
    """Memoize the py4j handle of ``org.apache.spark.sql.functions.<name>``.

    Stock pyspark re-resolves the JVM class and member on EVERY
    ``F.<fn>`` call — ~13 gateway round trips per call, measured 2.3 ms
    each on this box, which makes building expression-heavy query plans
    (URL/JSON dialect families: hundreds of Column ops) cost 0.5-0.7 s
    of pure driver latency before anything executes. The JavaMember
    handle is stateless, so memoizing it per (SparkContext, name) is
    safe; the cache lives on the context object and dies with it, so a
    session restart re-resolves against the new JVM. One round trip per
    call remains (the invocation itself).
    """
    try:
        import pyspark.sql.functions.builtin as _builtin
        orig = _builtin._get_jvm_function
    except (ImportError, AttributeError):  # pragma: no cover - other pyspark layouts
        return
    if getattr(_builtin, "_gs_cached_lookup", False):
        return

    def cached(name, sc):
        cache = sc.__dict__.get("_gs_jvm_fn_cache")
        if cache is None:
            cache = sc.__dict__["_gs_jvm_fn_cache"] = {}
        fn = cache.get(name)
        if fn is None:
            fn = cache[name] = orig(name, sc)
        return fn

    _builtin._get_jvm_function = cached
    _builtin._gs_cached_lookup = True


def get_spark(app_name: str = "graphouse-spark", shuffle_partitions: int | None = None) -> SparkSession:
    _install_fast_function_lookup()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Python workers import pyspark from pyspark.zip, and every task's
        # bootstrap calls importlib.invalidate_caches() — on Python 3.11
        # that re-reads the whole zip directory per task (~0.3-0.4 s of
        # CPU each). The custom daemon backports the 3.12 mtime guard;
        # see graphouse_spark/pydaemon.py for the measurements. The
        # daemon process must be able to import this package, which the
        # engine's kernels already require of workers — PYTHONPATH makes
        # it independent of the driver's cwd.
        .config("spark.python.daemon.module", "graphouse_spark.pydaemon")
        .config("spark.executorEnv.PYTHONPATH", _worker_pythonpath())
        # local/medium shuffles: the bypass-merge writer creates
        # (reducers) files per MAP task + concatenates them; measured
        # here a trivial 32x32-task exchange costs 3-8 s of executor
        # task time in file creation/codec init vs 0.38 s through the
        # sort writer (one file per map task, with spark.local.dir on
        # tmpfs below — the two settings were A/B'd jointly at both the
        # trivial and the 10M-row backfill scale and win together:
        # backfill task 651 -> 512 s vs the bypass writer on tmpfs).
        # At cluster scale the bypass path never fires anyway
        # (reducers >> 200), so forcing the sort writer changes nothing
        # in production plans.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        # driver test data carries TIMESTAMP(NANOS) which Spark has no type
        # for; read as long (nanos since epoch) and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4 wraps every Column/functions call with a call-site
        # capture for richer error messages: per F.<fn> call that is a
        # getActiveSession + a conf read + a PySparkCurrentOrigin
        # set/clear (each a py4j round trip) + a Python stack walk —
        # measured ~2.3 ms per expression call on this box, 0.5-0.8 s
        # of driver latency to BUILD an expression-heavy plan. Purely
        # an error-message nicety; results are unaffected.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Spark 4.1 can run the JVM<->Python-worker channel over Unix
        # domain sockets instead of a fresh TCP loopback connection +
        # auth handshake per task. Probe (trivial 32-task mapInPandas,
        # 6 runs): task time 1.8-2.2 s -> 0.6-1.0 s per run; every
        # Python-kernel stage pays this floor, on a real executor node
        # exactly as in local mode. Results are transport-independent.
        .config("spark.python.unix.domain.socket.enabled", "true")
    )
    local_dir = _default_local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()


def cluster_conf(executor_cores: int = 4, executors: int = 1000,
                 target_partition_mb: int = 128) -> dict[str, str]:
    """The conf this engine would ship to a real 100 TB cluster.

    Not used by the local factory (local[N] ignores most of it) —
    documented as code so the scale posture is explicit and testable:

    - shuffle partitions ~2x total cores: keeps every core busy through
      stragglers while AQE coalesces the small ones post-shuffle;
    - 128 MiB scan splits: matches parquet row-group sizing from
      sources/tables.py, so one task ~ one row group;
    - AQE owns runtime re-planning (skew splits, join demotion);
    - 64 MiB broadcast threshold: nation/region/supplier-sized dims
      broadcast, fact-fact joins shuffle;
    - shuffle + spill compression on: at 100 TB the network is the
      bottleneck, not CPU.
    """
    total_cores = executor_cores * executors
    return {
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.sql.parquet.filterPushdown": "true",
    }
