"""ClickHouse mutations: ``ALTER TABLE ... DELETE / UPDATE WHERE`` for
the parquet data lake.

CH executes mutations as background part rewrites — every part that
may contain matching rows is rewritten without (or with updated) rows,
atomically swapped in. The Spark twin:

1. prune: only date partitions whose rows can match are rewritten
   (predicate on ``date`` prunes directly; otherwise a cheap matching-
   partition scan finds them — the analog of CH's part-level predicate
   analysis);
2. rewrite each affected partition with the mutation applied, staged
   to a sibling temp dir with the scan-optimized layout preserved
   (sorted by (date, metric, timestamp));
3. commit through the same rename-based partition protocol rollup
   compaction uses (``operators/rollup._commit_partition``): readers
   never see partial state, every crash point is recoverable by
   ``recover_compaction``.

Deletes are the GDPR/TTL workhorse of a training-data lake; updates
cover backfill-style fixes. Both are idempotent — re-running a
mutation whose predicate no longer matches rewrites nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.operators.rollup import (
    _commit_partition,
    _stage,
    recover_compaction,
)


def _affected_dates(data: DataFrame, condition: Column) -> list:
    """Date partitions that contain at least one matching row — one
    aggregate scan with the predicate pushed down."""
    return sorted(
        r["date"] for r in
        data.filter(condition).select("date").distinct().collect()
    )


def _rewrite_partitions(spark: SparkSession, data_path: str,
                        transform, condition: Column) -> list:
    """Stage ``transform(partition_rows)`` for each date the condition
    touches, then commit via the atomic rename protocol (Hadoop
    FileSystem of the table path — local/HDFS; see fs.py for the
    object-store story). Returns rewritten dates.

    The affected-dates scan runs INSIDE the writer lease: planned
    against a file listing, it would otherwise race a concurrent
    compaction's swap (FILE_NOT_EXIST mid-scan) — under the lease no
    rewriter can retire files between the scan and the rewrite, and
    appends only ever ADD files."""
    from graphouse_spark import manifest as mf
    from graphouse_spark.fs import get_fs, writer_lease
    from graphouse_spark.sources.tables import read_data

    fs = get_fs(data_path, spark)
    # single-writer contract: a mutation must not interleave its
    # stage/swap states with a concurrent compaction's on the same
    # partitions (round-12 verdict #2)
    with writer_lease(fs, data_path) as lease:
        recover_compaction(data_path, fs)
        if mf.manifest_mode(fs):
            return _rewrite_partitions_manifest(spark, data_path,
                                                transform, condition, fs)
        dates = _affected_dates(read_data(spark, data_path), condition)
        if not dates:
            return []
        tmp_path = data_path.rstrip("/") + "_mutation_tmp"
        data = read_data(spark, data_path)
        subset = data.filter(F.col("date").isin([str(d) for d in dates]))
        (
            transform(subset)
            .repartition("metric")
            .sortWithinPartitions("date", "metric", "timestamp")
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(tmp_path)
        )
        lease.renew()  # the big write is the long pole; commits are quick
        rewritten = []
        for d in dates:
            src = tmp_path.rstrip("/") + f"/date={d}"
            stage = _stage(data_path, str(d))
            fs.delete(stage)
            if fs.exists(src):
                fs.rename(src, stage)
            else:
                # every matching row of this partition was deleted: stage an
                # empty partition dir so the commit removes the old data
                fs.mkdirs(stage)
            _commit_partition(data_path, str(d), fs)
            rewritten.append(str(d))
        fs.delete(tmp_path)
        return rewritten


def _rewrite_partitions_manifest(spark: SparkSession, data_path: str,
                                 transform, condition: Column,
                                 fs) -> list:
    """Mutations on a rename-less store (r13): the per-partition
    generation + pointer-commit protocol rollup compaction uses —
    resolve the table ONCE (the snapshot is both the rewrite input and
    the commit's ``replaced`` lists), write the transformed aged
    partitions straight into a fresh hidden generation, flip with one
    atomic manifest write. A partition whose every row was deleted
    commits with no generation subdirectory — the pointer replaces all
    its files and readers resolve it empty (the rename path's
    staged-empty-dir equivalent)."""
    import time as _time

    from graphouse_spark import manifest as mf
    from graphouse_spark.schemas import DATA_SCHEMA

    root = data_path.rstrip("/")
    now = int(_time.time())
    man = mf.read_table_manifest(fs, root)
    if man is not None:
        man = mf.gc_data_manifest(fs, root, man, now)
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
    dates = _affected_dates(data, condition)
    if not dates:
        return []
    date_strs = [str(d) for d in dates]
    replaced_by_date: dict[str, list] = {d: [] for d in date_strs}
    for p in mf.live_root_files(fs, root, man):
        rel = mf.rel_path(fs, root, p)
        for seg in rel.split("/"):
            if seg.startswith("date="):
                d = seg[len("date="):]
                if d in replaced_by_date:
                    replaced_by_date[d].append(rel)
                break
    gen = mf.new_gen_name(now)
    subset = data.filter(F.col("date").isin(date_strs))
    (
        transform(subset)
        .repartition("metric")
        .sortWithinPartitions("date", "metric", "timestamp")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(f"{root}/{gen}")
    )
    mf.commit_data_generation(fs, root, gen, replaced_by_date, now)
    return date_strs


def delete_where(spark: SparkSession, data_path: str,
                 condition: Column) -> list:
    """CH ``ALTER TABLE data DELETE WHERE <condition>``: rewrite every
    affected date partition without the matching rows. Returns the
    rewritten partition dates (empty when nothing matched)."""
    return _rewrite_partitions(
        spark, data_path, lambda df: df.filter(~condition), condition
    )


def update_where(spark: SparkSession, data_path: str, condition: Column,
                 assignments: dict) -> list:
    """CH ``ALTER TABLE data UPDATE col = expr WHERE <condition>``:
    rewrite affected partitions applying ``assignments`` (column ->
    Column expression) to matching rows only. The partition column
    itself cannot be assigned (CH has the same restriction)."""
    if "date" in assignments:
        raise ValueError("cannot UPDATE the partitioning column 'date'")

    def apply(df: DataFrame) -> DataFrame:
        for col, expr in assignments.items():
            df = df.withColumn(col, F.when(condition, expr).otherwise(F.col(col)))
        return df

    return _rewrite_partitions(spark, data_path, apply, condition)


def ttl_delete(spark: SparkSession, data_path: str, max_age_seconds: int,
               now_seconds: int) -> list:
    """CH table ``TTL timestamp + INTERVAL``: drop rows older than the
    horizon. Whole partitions past the horizon are the common case and
    the rewrite of one reduces to writing its surviving (empty) set."""
    return delete_where(
        spark, data_path,
        F.col("timestamp") < F.lit(int(now_seconds - max_age_seconds)),
    )
