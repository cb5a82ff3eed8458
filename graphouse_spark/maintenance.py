"""Scheduled maintenance — the reference's background loops as batch jobs.

T8 mapping (SURVEY §2.9): tree refresh 60s / autohide daily /
statistics flush become explicit, idempotent batch functions a
scheduler (cron, Airflow, `availableNow` triggers) invokes:

- :func:`run_autohide`  — X5: flip stale sparse metrics to AUTO_HIDDEN
  (AutoHideService.java:68-160)
- :func:`run_rollup`    — A7: compact aged partitions to tier precision
- :func:`run_metrics_compaction` — finalize Replacing semantics on the
  name table so bootstrap scans stay cheap
- :func:`run_all`       — the nightly bundle; returns a report dict
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphouse_spark.operators.autohide import autohide_updates
from graphouse_spark.operators.rollup import compact_data_table
from graphouse_spark.retention import CombinedRetentionProvider, DefaultRetentionProvider
from graphouse_spark.sources.tables import read_data, read_metrics, write_metrics


def run_autohide(spark: SparkSession, data_path: str, metrics_path: str,
                 max_values_count: int = 200, retention_days: int = 7,
                 now_seconds: int | None = None) -> int:
    data = read_data(spark, data_path)
    metrics = read_metrics(spark, metrics_path)
    updates = autohide_updates(data, metrics, max_values_count, retention_days, now_seconds)
    n = updates.count()
    if n:
        write_metrics(updates, metrics_path)
    return n


def run_rollup(spark: SparkSession, data_path: str,
               provider: CombinedRetentionProvider | None = None,
               min_age_seconds: int = 7 * 86400,
               now_seconds: int | None = None) -> list[str]:
    provider = provider or DefaultRetentionProvider()
    return compact_data_table(spark, data_path, provider, now_seconds, min_age_seconds)


def run_metrics_compaction(spark: SparkSession, metrics_path: str) -> int:
    """Rewrite the name table to one (latest) row per name, in place.

    The table is append-only between compactions; this bounds the
    argMax work every read performs. Small table -> full rewrite
    through a dot-hidden sibling stage is fine at any realistic tree
    size. The swap is the generic three-path protocol on the table's
    Hadoop FileSystem (stage -> live with a backup; every crash point
    rolls forward/back via :func:`graphouse_spark.fs.recover_swap`,
    which runs first) — the previous local-tempdir form had a window
    where a crash between rmtree and move lost the table, and could
    not target an HDFS table at all. On rename-less stores the swap
    is a whole-table generation + pointer flip (r13, same protocol as
    the tag-index rewrite); an append racing the flip lands in the
    superseded generation and is dropped with it — the SAME loss
    class as the rename path (whose live->bak rename carries racing
    appends into the deleted backup), and self-healing the same way:
    a lost registration re-registers the next time the metric reports
    (T6 reopen-on-data).
    """
    import time as _time

    from graphouse_spark import fs as fs_mod
    from graphouse_spark import manifest as mf
    from graphouse_spark.fs import get_fs, recover_swap, writer_lease
    from graphouse_spark.operators.dedup import latest_status

    fs = get_fs(metrics_path, spark)
    with writer_lease(fs, metrics_path):
        if mf.manifest_mode(fs):
            now = int(_time.time())
            root = fs.norm(metrics_path).rstrip("/")
            gen = mf.new_gen_name(now)
            latest = latest_status(read_metrics(spark, metrics_path))
            write_metrics(latest, f"{root}/{gen}", mode="overwrite")
            n = spark.read.parquet(f"{root}/{gen}").count()
            mf.commit_table_generation(fs, root, gen, now)
            return n
        live = fs.norm(metrics_path)
        parent, base = fs_mod.parent_dir(live), fs_mod.base_name(live)
        stage = f"{parent}/.{base}_compact.stage"
        bak = f"{parent}/.{base}_compact.bak"
        recover_swap(fs, live, stage, bak)

        latest = latest_status(read_metrics(spark, metrics_path))
        write_metrics(latest, stage, mode="overwrite")
        n = spark.read.parquet(stage).count()
        fs.rename(live, bak)
        fs.rename(stage, live)
        fs.delete(bak)
        return n


def run_tags_compaction(spark: SparkSession, tags_path: str) -> int:
    """Rewrite the tag index to DISTINCT rows, in place.

    Ingest appends one file per micro-batch per active date, and an
    active series re-appends its rows every batch — between
    compactions the index is (duplicated rows x small files); this
    restores one row per (metric, tag, value, date) and one sorted
    file per date partition. Same collect-free staged swap as the
    metrics compaction; the index is per-series, so it stays orders of
    magnitude smaller than the data table at any scale."""
    from graphouse_spark.fs import get_fs
    from graphouse_spark.sources.tables import rewrite_tags_atomic

    if not get_fs(tags_path, spark).exists(tags_path):
        return 0
    # crash-safe, locked stage->swap rewrite; parallel write (hash by
    # date -> one sorted file per partition) — tables.rewrite_tags_atomic
    return rewrite_tags_atomic(spark, tags_path,
                               lambda idx: idx.distinct())


def run_index_update(spark: SparkSession, data_path: str, index_path: str,
                     cols: tuple = ("metric", "timestamp")) -> int:
    """Refresh the persisted zonemap AFTER compaction/rollup rewrote
    files: new files get footer-read, dead files' rows are dropped.
    First run bootstraps the index. Returns the zonemap row count."""
    from graphouse_spark.fs import get_fs
    from graphouse_spark.sources import skipping

    if get_fs(index_path, spark).exists(index_path):
        existing = skipping.read_file_index(spark, index_path)
        idx = skipping.update_file_index(spark, data_path, existing, list(cols))
    else:
        idx = skipping.build_file_index(spark, data_path, list(cols))
    # the index is tiny; localCheckpoint cuts the lineage so the
    # overwrite below does not read the file it is replacing
    idx = idx.localCheckpoint()
    skipping.write_file_index(idx, index_path)
    return idx.count()


def run_bloom_update(spark: SparkSession, data_path: str, index_path: str,
                     col: str = "metric", fpp: float = 0.01) -> int:
    """Refresh the bloom sidecar (`<index_path>_bloom`) the same way:
    never-seen files get their metric column read, dead files drop.
    Returns the bloom row count (one per live data file)."""
    from graphouse_spark.fs import get_fs
    from graphouse_spark.sources import skipping

    bloom_path = index_path.rstrip("/") + "_bloom"
    if get_fs(bloom_path, spark).exists(bloom_path):
        existing = skipping.read_bloom_index(spark, bloom_path)
        idx = skipping.update_bloom_index(spark, data_path, existing, col, fpp)
    else:
        idx = skipping.build_bloom_index(spark, data_path, col, fpp)
    idx = idx.localCheckpoint()
    skipping.write_bloom_index(idx, bloom_path)
    return idx.count()


def run_all(spark: SparkSession, data_path: str, metrics_path: str,
            provider: CombinedRetentionProvider | None = None,
            now_seconds: int | None = None,
            index_path: str | None = None,
            tags_path: str | None = None,
            autohide_enabled: bool = True,
            autohide_max_values_count: int = 200,
            autohide_missing_days: int = 7) -> dict:
    """The nightly bundle. Order matters: autohide reads pre-rollup
    counts (rollup shrinks them), so it runs first — same relative
    ordering as the reference's daily autohide vs continuous merges.
    The zonemap refresh runs LAST so it indexes the post-rollup files.
    The autohide knobs mirror graphouse.autohide.* (config.py)."""
    hidden = 0
    if autohide_enabled:
        hidden = run_autohide(spark, data_path, metrics_path,
                              max_values_count=autohide_max_values_count,
                              retention_days=autohide_missing_days,
                              now_seconds=now_seconds)
    rolled = run_rollup(spark, data_path, provider, now_seconds=now_seconds)
    compacted = run_metrics_compaction(spark, metrics_path)
    report = {"autohidden": hidden, "rolled_partitions": rolled, "metrics_rows": compacted}
    if tags_path is not None:
        report["tag_rows"] = run_tags_compaction(spark, tags_path)
    if index_path is not None:
        report["zonemap_rows"] = run_index_update(spark, data_path, index_path)
        report["bloom_rows"] = run_bloom_update(spark, data_path, index_path)
    return report
