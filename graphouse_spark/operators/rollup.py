"""Rollup compaction — the GraphiteMergeTree replacement (A7, SURVEY §7 step 6).

ClickHouse's GraphiteMergeTree collapses points older than each
retention tier's ``age`` into ``precision``-sized buckets with the
pattern's aggregation function, during background merges. Spark has no
storage-engine hook, so rollup is an explicit, idempotent batch job:

  for each date partition older than the finest tier:
    resolve (function, precision) per metric at age = now - ts
    LWW-dedup (A1)  ->  bucket to the tier precision with the
    pattern function  ->  overwrite the partition

Invariant (same as the reference): query results are unchanged by
compaction, because the read path applies the same dedup + bucket
aggregation regardless (MetricDataService.java:71-82 runs on both raw
and rolled-up rows).

Scale notes:
- partition-overwrite (dynamic mode) rewrites only aged partitions;
- retention resolution is a regex-rule lookup per *metric name*, not
  per row: we resolve distinct names (small) and broadcast-join the
  (metric -> function, precision) map back onto the points;
- the bucket agg itself is the single-pass multi-function variant —
  one shuffle for all patterns.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.operators.bucket import bucket_aggregate_multi
from graphouse_spark.operators.dedup import dedup_points
from graphouse_spark.retention import CombinedRetentionProvider


def resolve_retention_names(spark: SparkSession, names: list,
                            provider: CombinedRetentionProvider) -> DataFrame:
    """(metric, function, ranges: array<struct<age,step>>) per name.

    Rule regexes run driver-side over distinct NAMES only — the same
    set the reference keeps in its in-memory tree (J3), bounded by
    metric cardinality, never by names x days. The age -> precision
    lookup moves to executors (see rollup_partition), so adding a year
    of history costs nothing driver-side. If the name set ever outgrows
    the driver, the first-match itself can move to a crossJoin+rlike+
    min_by(priority) plan; the rule list is tiny either way.
    """
    rows = []
    for name in names:
        r = provider.get_retention(name)
        rows.append((name, r.function, [(int(a), int(p)) for a, p in r.ranges]))
    return spark.createDataFrame(
        rows, "metric string, function string, ranges array<struct<age:int,step:int>>"
    )


def resolve_retention_map(names: DataFrame,
                          provider: CombinedRetentionProvider) -> DataFrame:
    """Executor-side retention resolution: the scale path of
    :func:`resolve_retention_names`.

    The rule WALK (first-match + RETENTION/AGGREGATION combination,
    CombinedRetentionProvider.java:21-95) runs unchanged on executors —
    the provider (a tiny rule list with compiled regexes) pickles into
    the task closure, and each task resolves its slice of distinct
    names. This reuses the exact anchored-``re`` semantics instead of
    re-deriving them in SQL ``rlike`` (Java regex — a dialect drift
    risk), and the result is a DataFrame co-keyed on ``metric`` for a
    plain shuffle join. 10M names cost one short map stage, never a
    driver round-trip.
    """
    import pandas as pd

    def resolve(batches):
        # fresh cache per task; the provider came through the closure
        for pdf in batches:
            fns, rngs = [], []
            for name in pdf["metric"]:
                r = provider.get_retention(name)
                fns.append(r.function)
                rngs.append([{"age": int(a), "step": int(p)} for a, p in r.ranges])
            yield pd.DataFrame({"metric": pdf["metric"], "function": fns, "ranges": rngs})

    return names.select("metric").mapInPandas(
        resolve, "metric string, function string, ranges array<struct<age:int,step:int>>"
    )


def rollup_partition(spark: SparkSession, points: DataFrame,
                     provider: CombinedRetentionProvider,
                     now_seconds: int,
                     max_driver_names: int = 100_000) -> DataFrame:
    """Compact a slice of the data table per retention rules.

    Returns the replacement rows (same schema). Points whose tier
    precision is 1 pass through dedup only.

    The age of a day is measured at its end (23:59:59), so a whole
    partition gets one precision — matching GraphiteMergeTree, whose
    rollup params come from the merge window, not per row. The
    age -> step lookup runs executor-side against the broadcast ranges
    array: ranges are sorted ascending by age threshold, so the match
    is the LAST element with age <= day age (bisect_right - 1, as
    MetricRetention.step_size does in Python).
    """
    distinct_names = points.select("metric").distinct()
    # name-count gate: below the threshold the driver resolves and
    # broadcasts (one tiny createDataFrame, zero extra shuffle on the
    # join); above it the resolution itself moves to executors and the
    # join becomes a plain shuffle join — no driver materialization of
    # a 10M-name set (the reference holds the same set in its JVM tree;
    # at its own 10M-name guidance that round-trip is multi-GB).
    n_names = distinct_names.count()
    if n_names == 0:
        return points
    if n_names <= max_driver_names:
        names = [r["metric"] for r in distinct_names.collect()]
        ret_map = F.broadcast(resolve_retention_names(spark, names, provider))
    else:
        ret_map = resolve_retention_map(distinct_names, provider)

    deduped = dedup_points(points).withColumn(
        "date", F.to_date(F.from_unixtime("timestamp"))
    )  # (metric, timestamp, value, updated, date)
    day_end = F.unix_timestamp(F.date_add(F.col("date"), 1).cast("timestamp")) - 1
    age = F.greatest(F.lit(int(now_seconds)) - day_end, F.lit(0).cast("long"))
    precision = F.element_at(F.filter("ranges", lambda r: r["age"] <= age), -1)["step"]
    tagged = (
        deduped.join(ret_map, "metric")
        .withColumn("precision", precision)
        .drop("ranges")
    )
    rolled = (
        tagged.groupBy(
            "metric",
            "function",
            (F.col("timestamp") - F.col("timestamp") % F.col("precision")).alias("ts"),
        )
        .agg(
            F.avg("value").alias("_avg"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
            F.sum("value").alias("_sum"),
            F.min_by("value", "timestamp").alias("_any"),
            F.max_by("value", "timestamp").alias("_last"),
            F.max("updated").alias("updated"),
        )
    )
    value = (
        F.when(F.col("function") == "avg", F.col("_avg"))
        .when(F.col("function") == "min", F.col("_min"))
        .when(F.col("function") == "max", F.col("_max"))
        .when(F.col("function") == "sum", F.col("_sum"))
        .when(F.col("function") == "any", F.col("_any"))
        .otherwise(F.col("_last"))
    )
    return rolled.select(
        "metric",
        value.alias("value"),
        F.col("ts").alias("timestamp"),
        F.to_date(F.from_unixtime("ts")).alias("date"),
        "updated",
    )


#: staging / backup names for the partition commit protocol. Both are
#: dot-prefixed: Spark's file listing skips hidden paths, so readers
#: NEVER see a half-written or half-swapped partition.
_STAGE_SUFFIX = ".new"
_BACKUP_SUFFIX = ".bak"


def _stage(data_path: str, d: str) -> str:
    return data_path.rstrip("/") + f"/.date={d}{_STAGE_SUFFIX}"


def _backup(data_path: str, d: str) -> str:
    return data_path.rstrip("/") + f"/.date={d}{_BACKUP_SUFFIX}"


def _live(data_path: str, d: str) -> str:
    return data_path.rstrip("/") + f"/date={d}"


def _commit_partition(data_path: str, d: str, fs=None) -> None:
    """Swap a staged partition in, one atomic rename at a time.

    Sequence (stage dir already present):
      1. live -> backup   (atomic rename; partition vanishes from
                           listings, but only for the instant between
                           1 and 2 — and a crash there is recoverable)
      2. stage -> live    (atomic rename; new data visible)
      3. remove backup
    Every intermediate state is enumerated by :func:`recover_compaction`.

    All steps go through the Hadoop FileSystem of ``data_path``
    (:mod:`graphouse_spark.fs`): rename(2)-atomic on local disk,
    NameNode-atomic on HDFS, refused on rename-less object stores
    (deploy those as Iceberg/Delta — fs.py design note).
    """
    from graphouse_spark.fs import get_fs

    fs = fs or get_fs(data_path)
    live, stage, backup = _live(data_path, d), _stage(data_path, d), _backup(data_path, d)
    if fs.exists(live):
        fs.rename(live, backup)
    fs.rename(stage, live)
    fs.delete(backup)


def recover_compaction(data_path: str, fs=None) -> list[str]:
    """Roll the commit protocol forward/back after a crash.

    For each partition with leftover protocol dirs (the
    :func:`graphouse_spark.fs.recover_swap` state machine):
    - stage + live present          -> crashed before step 1: drop the
      stale stage (the rerun regenerates it).
    - stage + backup, no live       -> crashed between 1 and 2: finish
      the swap (stage -> live, drop backup).
    - backup + live, no stage       -> crashed before step 3: drop the
      backup.
    - backup only                   -> restore it to live.
    Afterwards the table is readable and compaction is re-runnable.
    Returns the partitions touched.
    """
    import re as _re

    from graphouse_spark import manifest as mf
    from graphouse_spark.fs import get_fs, recover_swap

    fs = fs or get_fs(data_path)
    if mf.manifest_mode(fs):
        # manifest tables have NO crash states to roll forward or
        # back — the only reader-visible mutation is one atomic
        # pointer write; recovery is just the idempotent GC sweep
        # (aged unreferenced generations = crashed compactions, aged
        # dead files = interrupted sweeps)
        import time as _time
        man = mf.read_table_manifest(fs, data_path)
        if man is not None:
            mf.gc_data_manifest(fs, data_path, man, int(_time.time()))
        return []
    if not fs.is_dir(data_path):
        return []
    touched = []
    pat = _re.compile(r"^\.date=(.+)(" + _re.escape(_STAGE_SUFFIX) + "|"
                      + _re.escape(_BACKUP_SUFFIX) + r")$")
    dates = {m.group(1) for name in fs.listdir(data_path)
             if (m := pat.match(name))}
    for d in sorted(dates):
        recover_swap(fs, _live(data_path, d), _stage(data_path, d),
                     _backup(data_path, d))
        touched.append(d)
    return touched


def compact_data_table(spark: SparkSession, data_path: str,
                       provider: CombinedRetentionProvider,
                       now_seconds: int | None = None,
                       min_age_seconds: int = 7 * 86400) -> list[str]:
    """Roll up every date partition older than ``min_age_seconds``.

    Idempotent: re-running maps already-rolled points onto the same
    buckets. Returns the list of rewritten partition dates.

    The rewrite goes through a sibling temp path, then commits each
    partition via the rename-based protocol above (stage -> backup ->
    swap -> cleanup; all single-directory renames, atomic on POSIX and
    HDFS). Readers only ever list the live ``date=`` dirs — staged and
    backup dirs are dot-hidden. A crash at ANY point leaves the table
    readable and the job re-runnable after :func:`recover_compaction`
    (which runs automatically at the start of every compaction). On a
    table format (Delta/Iceberg) this whole dance collapses to
    ``replaceWhere`` — the protocol is the bare-parquet equivalent.
    """
    from graphouse_spark import manifest as mf
    from graphouse_spark.fs import get_fs
    from graphouse_spark.sources.tables import read_data

    from graphouse_spark.fs import writer_lease

    fs = get_fs(data_path, spark)
    # single-writer contract (r12 verdict #2): compaction must not
    # interleave stage/swap states with a concurrent delete/update
    # mutation on the same partitions; appends never take the lease
    with writer_lease(fs, data_path) as lease:
        recover_compaction(data_path, fs)

        now = now_seconds if now_seconds is not None else int(dt.datetime.now(dt.timezone.utc).timestamp())
        cutoff = dt.datetime.fromtimestamp(now - min_age_seconds, dt.timezone.utc).date()
        if mf.manifest_mode(fs):
            return _compact_manifest_mode(spark, data_path, provider, now,
                                          cutoff, fs)
        return _compact_rename_mode(spark, data_path, provider, now,
                                    cutoff, fs, lease)


def _compact_rename_mode(spark: SparkSession, data_path: str,
                         provider: CombinedRetentionProvider,
                         now: int, cutoff, fs, lease) -> list[str]:
    from graphouse_spark.sources.tables import read_data

    data = read_data(spark, data_path)
    dates = sorted(r["date"] for r in data.select("date").distinct().collect() if r["date"] < cutoff)
    if not dates:
        return []

    tmp_path = data_path.rstrip("/") + "_rollup_tmp"
    aged = data.filter(F.col("date").isin([str(d) for d in dates]))
    rolled = rollup_partition(spark, aged, provider, now)
    # size the rewrite by INPUT bytes (an upper bound on the rolled
    # output) targeting ~64 MB files PER DATE: a fixed shuffle-partition
    # count would re-fragment small partitions into dozens of near-empty
    # files, and a single global count spread across partitionBy("date")
    # splits into up to n_out files per date — a compaction that leaves
    # small files behind defeats itself under the streaming append loop
    # it exists to serve. Listing goes through the Hadoop FileSystem of
    # the actual path (not local pathlib), so HDFS tables size
    # correctly too; a date whose listing finds nothing falls back to a
    # logged default rather than silently funneling into one task.
    date_bytes: dict[str, int] = {}
    for d in dates:
        try:
            b = sum(sz for _, sz in fs.list_files(_live(data_path, str(d))))
        except Exception:
            b = 0
        date_bytes[str(d)] = b
    fallback = [d for d, b in date_bytes.items() if b == 0]
    if fallback:
        import logging
        logging.getLogger(__name__).warning(
            "compaction: no parquet bytes listed under %s for dates %s; "
            "using default of 4 output files each", data_path, fallback)
    # per-date output-file count, then ONE shuffle keyed (date, salt):
    # each (date, salt) cell targets ~64 MB, and partitionBy("date")
    # writes each cell as one file in its own dir (a hash collision
    # merging two cells into a task yields fewer/bigger files, never
    # re-fragmentation)
    n_per_date = {
        d: max(1, min(256, -(-b // (64 << 20)))) if b else 4
        for d, b in date_bytes.items()
    }
    n_out = int(sum(n_per_date.values()))
    salt_expr = F.pmod(
        F.xxhash64("metric"),
        F.coalesce(*(
            [F.when(F.col("date") == d, F.lit(n)) for d, n in n_per_date.items()]
            + [F.lit(1)])))
    (
        rolled.withColumn("__salt", salt_expr)
        .repartition(n_out, "date", "__salt")
        .drop("__salt")
        .sortWithinPartitions("date", "metric", "timestamp")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(tmp_path)
    )
    lease.renew()  # the rolled write is the long pole; commits are quick
    rewritten = []
    for d in dates:
        src = tmp_path.rstrip("/") + f"/date={d}"
        if fs.exists(src):
            # stage into the table dir first (same filesystem as the
            # sibling tmp path, so this is a rename, not a copy)
            stage = _stage(data_path, str(d))
            fs.delete(stage)
            fs.rename(src, stage)
            _commit_partition(data_path, str(d), fs)
            rewritten.append(str(d))
    fs.delete(tmp_path)
    return rewritten


def _compact_manifest_mode(spark: SparkSession, data_path: str,
                           provider: CombinedRetentionProvider,
                           now: int, cutoff, fs) -> list[str]:
    """Rollup compaction on a rename-less store (round-12 verdict #1):
    the generation + pointer-commit protocol instead of directory
    renames.

    1. resolve the table ONCE (manifest or legacy namespace) into
       (basePath, files) scan groups — this snapshot is both the
       rollup input and the commit's ``replaced`` list, so a file
       appended mid-compaction is neither rolled nor marked dead: it
       stays live and the next run absorbs it;
    2. roll the aged dates and write them — sized like the rename
       path, ~64 MB output files per date — STRAIGHT into a fresh
       dot-hidden ``.gen-`` dir under the table root (no sibling tmp,
       no renames; hidden dirs are invisible to legacy listings);
    3. flip: ONE atomic manifest write points every rolled date at the
       generation and records the absorbed root files; readers resolve
       old-or-new, never a mix (the rename path, by contrast, needs a
       per-date three-state swap);
    4. GC aged dead files and unreferenced generations (grace window
       protects in-flight readers and concurrent writers).

    A crash before 3 leaves an unreferenced young generation (aged out
    later); after 3, dead-but-listed files the manifest already
    excludes. Query results are byte-identical at every step —
    tests/test_manifest_commit.py injects each one."""
    from graphouse_spark import manifest as mf
    from graphouse_spark.schemas import DATA_SCHEMA

    root = data_path.rstrip("/")
    man = mf.read_table_manifest(fs, root)
    groups = mf.resolve_data_sources(fs, root, man)
    if not groups:
        return []
    frames = [
        spark.read.schema(DATA_SCHEMA).option("basePath", base).parquet(*paths)
        for base, paths in groups
    ]
    data = frames[0]
    for f in frames[1:]:
        data = data.unionByName(f)
    dates = sorted(r["date"] for r in data.select("date").distinct().collect()
                   if r["date"] < cutoff)
    if not dates:
        return []
    date_strs = [str(d) for d in dates]

    # the commit's replaced lists: root-resident live files per aged
    # date, from the SAME snapshot the rollup reads (rel paths)
    live_root = mf.live_root_files(fs, root, man)
    replaced_by_date: dict[str, list[str]] = {d: [] for d in date_strs}
    date_bytes: dict[str, int] = {d: 0 for d in date_strs}
    root_sizes = dict(fs.list_files(root))
    for p in live_root:
        rel = mf.rel_path(fs, root, p)
        for seg in rel.split("/"):
            if seg.startswith("date="):
                d = seg[len("date="):]
                if d in replaced_by_date:
                    replaced_by_date[d].append(rel)
                    date_bytes[d] += root_sizes.get(p, 0)
                break
    # input bytes from committed generations too (they dominate after
    # the first run) — sizing only, never part of replaced
    for base, paths in groups:
        if base == root:
            continue
        for p in paths:
            d = p.rsplit("date=", 1)[-1]
            if d in date_bytes:
                date_bytes[d] += sum(sz for _, sz in fs.list_files(p))

    aged = data.filter(F.col("date").isin(date_strs))
    rolled = rollup_partition(spark, aged, provider, now)
    n_per_date = {
        d: max(1, min(256, -(-b // (64 << 20)))) if b else 4
        for d, b in date_bytes.items()
    }
    n_out = int(sum(n_per_date.values()))
    salt_expr = F.pmod(
        F.xxhash64("metric"),
        F.coalesce(*(
            [F.when(F.col("date") == d, F.lit(n)) for d, n in n_per_date.items()]
            + [F.lit(1)])))
    gen = mf.new_gen_name(now)
    (
        rolled.withColumn("__salt", salt_expr)
        .repartition(n_out, "date", "__salt")
        .drop("__salt")
        .sortWithinPartitions("date", "metric", "timestamp")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(f"{root}/{gen}")
    )
    committed = [d for d in date_strs if fs.exists(f"{root}/{gen}/date={d}")]
    if not committed:
        fs.delete(f"{root}/{gen}")
        return []
    mf.commit_data_generation(
        fs, root, gen, {d: replaced_by_date.get(d, []) for d in committed},
        now)
    return committed
