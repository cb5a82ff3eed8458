"""Zonemap data-skipping: correctness (never drops rows) + actual skipping."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.sources.skipping import (
    _data_files,
    build_file_index,
    prune_files,
    read_file_index,
    skipping_read,
    write_file_index,
)
from graphouse_spark.sources.tables import write_data


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """A small data lake laid out like write_data produces it: date
    partitions, files sorted by (metric, timestamp) so zones are tight."""
    root = str(tmp_path_factory.mktemp("lake") / "data")
    rows = spark.range(20000).select(
        F.concat(F.lit("m."), (F.col("id") % 50).cast("string")).alias("metric"),
        (F.col("id") % 97).cast("double").alias("value"),
        (F.lit(1704067200) + F.col("id") * 60).alias("timestamp"),
        F.to_date(F.from_unixtime(F.lit(1704067200) + F.col("id") * 60)).alias("date"),
        F.col("id").alias("updated"),
    )
    write_data(rows, root, mode="overwrite", target_partitions=8)
    return root


def test_zonemap_prunes_files_and_loses_no_rows(spark, lake):
    idx = build_file_index(spark, lake, ["timestamp", "metric"])
    total = len(_data_files(lake))
    assert idx.select("file").distinct().count() == total

    lo, hi = 1704067200 + 3 * 86400, 1704067200 + 4 * 86400
    kept = prune_files(idx, "timestamp", lo, hi)
    assert 0 < len(kept) < total  # actually skipped something

    got = skipping_read(spark, idx, "timestamp", lo, hi, base_path=lake)
    full = (
        spark.read.parquet(lake)
        .filter((F.col("timestamp") >= lo) & (F.col("timestamp") <= hi))
    )
    assert got.count() == full.count() > 0
    assert sorted(got.columns) == sorted(full.columns)


def test_zonemap_string_column_and_roundtrip(spark, lake, tmp_path):
    idx = build_file_index(spark, lake, ["metric"])
    p = str(tmp_path / "zonemap")
    write_file_index(idx, p)
    idx2 = read_file_index(spark, p)

    got = skipping_read(spark, idx2, "metric", "m.10", "m.19", base_path=lake)
    full = (
        spark.read.parquet(lake)
        .filter((F.col("metric") >= "m.10") & (F.col("metric") <= "m.19"))
    )
    assert got.count() == full.count() > 0


def test_zonemap_empty_range_keeps_schema(spark, lake):
    idx = build_file_index(spark, lake, ["timestamp"])
    got = skipping_read(spark, idx, "timestamp", 1, 2, base_path=lake)  # epoch 1970: no rows
    assert got.count() == 0
    assert "metric" in got.columns


def test_incremental_update_indexes_only_new_files(spark, lake, tmp_path):
    from graphouse_spark.sources.skipping import update_file_index

    idx = build_file_index(spark, lake, ["timestamp"])
    n0 = idx.count()

    # append one more day of data -> new files appear
    extra = spark.range(500).select(
        F.lit("m.99").alias("metric"),
        (F.col("id") % 5).cast("double").alias("value"),
        (F.lit(1704067200) + 40 * 86400 + F.col("id") * 60).alias("timestamp"),
        F.to_date(
            F.from_unixtime(F.lit(1704067200) + 40 * 86400 + F.col("id") * 60)
        ).alias("date"),
        F.col("id").alias("updated"),
    )
    write_data(extra, lake, mode="append", target_partitions=2)

    idx2 = update_file_index(spark, lake, idx, ["timestamp"])
    assert idx2.count() > n0
    assert idx2.select("file").distinct().count() == len(_data_files(lake))

    # idempotent: nothing new -> same index back
    idx3 = update_file_index(spark, lake, idx2, ["timestamp"])
    assert idx3.count() == idx2.count()

    # the new day is findable through the updated index
    lo = 1704067200 + 40 * 86400
    got = skipping_read(spark, idx2, "timestamp", lo, lo + 86400, base_path=lake)
    assert got.count() == 500


def test_multi_predicate_pruning_is_intersection(spark, lake):
    from graphouse_spark.sources.skipping import prune_files_multi

    idx = build_file_index(spark, lake, ["timestamp", "metric"])
    lo, hi = 1704067200 + 3 * 86400, 1704067200 + 4 * 86400
    t_only = set(prune_files(idx, "timestamp", lo, hi))
    m_only = set(prune_files(idx, "metric", "m.2", "m.3"))
    both = set(prune_files_multi(idx, [("timestamp", lo, hi), ("metric", "m.2", "m.3")]))
    assert both == t_only & m_only
    assert both <= t_only and both <= m_only


def test_metricdata_read_path_uses_zonemap(spark, lake, tmp_path):
    """The flagship /metricData plan consults the zonemap: a selective
    query scans strictly fewer files WITH the index than without, and
    returns the identical series dict (the index is an accelerator,
    never a second source of truth)."""
    from graphouse_spark.plans.metricdata import MetricDataService
    from graphouse_spark.sources.skipping import prune_files_for_query
    from graphouse_spark.sources.tables import read_data

    index_path = str(tmp_path / "zonemap")
    idx = build_file_index(spark, lake, ["metric", "timestamp"])
    write_file_index(idx, index_path)

    names = ["m.7"]
    start, end = 1704067200, 1704067200 + 86400

    # file-level: the pruner keeps a strict subset
    total = len(_data_files(lake))
    kept = prune_files_for_query(read_file_index(spark, index_path), names, start, end)
    assert 0 < len(kept) < total

    with_idx = MetricDataService(data_path=lake, index_path=index_path)
    without = MetricDataService()
    data = read_data(spark, lake)

    r_idx = with_idx.get_data(spark, data, names, start, end, now_seconds=end)
    r_full = without.get_data(spark, data, names, start, end, now_seconds=end)
    assert r_idx == r_full
    assert any(p is not None for p in r_idx["m.7"]["points"])

    # plan-level: the pruned source reads fewer files than the full scan
    pruned = with_idx._pruned_source(spark, names, start, end)
    assert pruned is not None
    assert 0 < len(pruned.inputFiles()) < len(data.inputFiles())

    # no index configured -> transparent fallback (None)
    assert without._pruned_source(spark, names, start, end) is None
    # configured-but-missing index dir -> transparent fallback too
    ghost = MetricDataService(data_path=lake, index_path=str(tmp_path / "nope"))
    assert ghost._pruned_source(spark, names, start, end) is None
    assert ghost.get_data(spark, data, names, start, end, now_seconds=end) == r_full


# ----------------------------------------------------------------- bloom


def test_bloom_index_no_false_negatives_and_prunes(spark, lake):
    from graphouse_spark.sources.skipping import (
        build_bloom_index, prune_files_bloom)

    blooms = build_bloom_index(spark, lake, "metric")
    total = len(_data_files(lake))
    assert blooms.count() == total

    # ground truth: which files actually hold m.7
    truth = {
        f for f in _data_files(lake)
        if spark.read.parquet(f).filter(F.col("metric") == "m.7").count() > 0
    }
    kept = set(prune_files_bloom(blooms, ["m.7"]))
    assert truth <= kept          # NEVER a false negative
    assert len(kept) < total      # and it actually skips files
    # absent name: tiny (fpp-bounded) survivor set
    ghost = prune_files_bloom(blooms, ["no.such.metric"])
    assert len(ghost) <= max(1, total // 10)


def test_bloom_sidecar_in_read_path_same_rows_fewer_files(spark, lake, tmp_path):
    from graphouse_spark.sources.skipping import (
        build_bloom_index, build_file_index, prune_files_for_query,
        read_pruned_data, write_bloom_index, write_file_index)

    zp = str(tmp_path / "zonemap")
    write_file_index(build_file_index(spark, lake, ["metric", "timestamp"]), zp)
    write_bloom_index(build_bloom_index(spark, lake, "metric"), zp + "_bloom")

    names = ["m.7", "m.31"]
    lo, hi = 1704067200, 1704067200 + 30 * 86400
    pruned = read_pruned_data(spark, lake, zp, names, lo, hi)
    assert pruned is not None
    full = spark.read.parquet(lake)
    pred = F.col("metric").isin(names) & (F.col("timestamp") >= lo) & (F.col("timestamp") < hi)
    assert pruned.filter(pred).count() == full.filter(pred).count() > 0

    # the bloom layer strictly tightens the zonemap survivor list here
    # (hash-partitioned metrics make lexicographic zones wide)
    from graphouse_spark.sources.skipping import read_file_index
    zonemap_only = prune_files_for_query(
        read_file_index(spark, zp), names, lo, hi)
    planned = pruned.inputFiles()
    assert len(planned) < len(zonemap_only)


def test_bloom_incremental_update_and_maintenance(spark, lake, tmp_path):
    import shutil

    from graphouse_spark.maintenance import run_bloom_update
    from graphouse_spark.sources.skipping import (
        build_bloom_index, read_bloom_index, update_bloom_index)

    root = str(tmp_path / "data")
    shutil.copytree(lake, root)
    zp = str(tmp_path / "zm")
    n1 = run_bloom_update(spark, root, zp)
    assert n1 == len(_data_files(root))

    # append a new partition -> only the new file gets indexed
    extra = spark.createDataFrame(
        [("m.new", 1.0, 1704067200, "2099-01-01", 0)],
        "metric string, value double, timestamp long, date string, updated long",
    )
    extra.write.mode("append").partitionBy("date").parquet(root)
    existing = read_bloom_index(spark, zp + "_bloom")
    known = {r["file"] for r in existing.select("file").collect()}
    updated = update_bloom_index(spark, root, existing)
    fresh = {r["file"] for r in updated.select("file").collect()} - known
    assert len(fresh) == len(_data_files(root)) - len(known)
    n2 = run_bloom_update(spark, root, zp)
    assert n2 == len(_data_files(root))


def test_relative_path_index_self_heals(spark, lake, monkeypatch,
                                        tmp_path):
    """r12 path-style change: listings return absolute paths where the
    old os.walk echoed a relative root verbatim. An index built
    against a RELATIVE table path (old rows store relative file
    names) must self-heal on update — all rows drop as 'dead' and the
    table re-footer-reads once — and never mis-prune in between
    (unknown files are always kept)."""
    import os

    from graphouse_spark.sources.skipping import update_file_index

    parent, base = os.path.split(lake.rstrip("/"))
    monkeypatch.chdir(parent)
    rel = base  # the same lake, addressed relatively
    abs_idx = build_file_index(spark, lake, ["timestamp"])
    # simulate a pre-r12 index: file names stored relative
    legacy = abs_idx.withColumn(
        "file", F.regexp_replace("file", f"^{parent}/", ""))
    healed = update_file_index(spark, rel, legacy, ["timestamp"])
    # same coverage as a fresh build: every live file indexed once
    assert healed.select("file").distinct().count() == \
        abs_idx.select("file").distinct().count()
    # and pruning through the healed index loses no rows (the healed
    # rows store absolute paths, so the base path is the absolute root)
    got = skipping_read(spark, healed, "timestamp", 1704067200,
                        1704067200 + 86400 * 60, base_path=lake)
    assert got.count() == spark.read.parquet(lake).count()
