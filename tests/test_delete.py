"""ALTER TABLE ... DELETE analog: crash-safe physical metric deletion.

Reference posture: graphouse BANs tree nodes; ClickHouse mutations
rewrite parts without the matching rows. The engine's delete rewrites
only affected date partitions through the shared stage->swap commit
protocol, so a crash at any step is recoverable."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.delete import (
    delete_from_metrics_table,
    delete_metrics,
)
from graphouse_spark.operators.rollup import recover_compaction
from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

BASE = 1_542_240_000  # partition boundary-friendly epoch


@pytest.fixture()
def lake(spark, tmp_path):
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"))
    lines = [
        f"one_min.{srv}.cpu {v}.0 {BASE + day * 86400}"
        for day in (0, 1)
        for srv, v in (("srv1", 1), ("srv2", 2), ("srv3", 3))
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    return cfg


def _metrics_left(spark, cfg):
    return {
        (r["metric"], r["date"].isoformat())
        for r in spark.read.parquet(cfg.data_path)
        .select("metric", "date").collect()
    }


def test_delete_exact_and_glob(spark, lake):
    out = delete_metrics(spark, lake.data_path, "one_min.srv2.cpu")
    assert out["rows_deleted"] == 2 and len(out["partitions_rewritten"]) == 2
    left = _metrics_left(spark, lake)
    assert all(m != "one_min.srv2.cpu" for m, _ in left)
    assert len(left) == 4  # srv1 + srv3 on both days

    out = delete_metrics(spark, lake.data_path, ["one_min.srv*.cpu"])
    assert out["rows_deleted"] == 4
    assert _metrics_left(spark, lake) == set()


def test_delete_skips_untouched_partitions(spark, lake, tmp_path):
    """A partition with no matching rows is never rewritten (its
    directory mtime/identity is preserved) — mutation work is bounded
    by affected data."""
    import os

    # add a second-day-only metric so only day 2 matches
    raw = spark.createDataFrame(
        [(f"one_min.onlyday2.cpu 9.0 {BASE + 86400}",)], "value string")
    cfg = lake
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    parts = sorted(p for p in os.listdir(cfg.data_path) if p.startswith("date="))
    day1 = os.path.join(cfg.data_path, parts[0])
    before = sorted(os.listdir(day1))
    out = delete_metrics(spark, cfg.data_path, "one_min.onlyday2.cpu")
    assert out["partitions_rewritten"] == [parts[1].split("=", 1)[1]]
    assert sorted(os.listdir(day1)) == before  # untouched files


def test_delete_crash_recovery(spark, lake, monkeypatch):
    """Crash between the two renames of the commit: recover_compaction
    heals the table and a re-run completes the delete."""
    import os

    import graphouse_spark.operators.delete as dmod

    real_commit = dmod._commit_partition
    calls = {"n": 0}

    def crashing(data_path, d, fs=None):
        # simulate dying after live -> backup (worst intermediate state)
        from graphouse_spark.operators.rollup import _backup, _live
        live = _live(data_path, d)
        os.rename(live, _backup(data_path, d))
        raise RuntimeError("injected crash mid-commit")

    monkeypatch.setattr(dmod, "_commit_partition", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        delete_metrics(spark, lake.data_path, "one_min.srv1.cpu")
    monkeypatch.setattr(dmod, "_commit_partition", real_commit)

    # table readable again after recovery, then the re-run finishes
    recover_compaction(lake.data_path)
    spark.read.parquet(lake.data_path).count()
    out = delete_metrics(spark, lake.data_path, "one_min.srv1.cpu")
    assert out["rows_deleted"] >= 1
    assert all(m != "one_min.srv1.cpu" for m, _ in _metrics_left(spark, lake))


def test_delete_from_metrics_table_bans(spark, lake):
    n = delete_from_metrics_table(spark, lake.metrics_path, "one_min.srv1.cpu")
    assert n == 1
    from graphouse_spark.operators.dedup import latest_status
    from graphouse_spark.sources.tables import read_metrics

    resolved = {r["name"]: r["status"]
                for r in latest_status(
                    read_metrics(spark, lake.metrics_path)).collect()}
    assert resolved["one_min.srv1.cpu"] == "BAN"


def test_cli_delete(spark, lake):
    from graphouse_spark.__main__ import build_parser, run_delete

    args = build_parser().parse_args([
        "delete", "one_min.srv3.cpu",
        "--data", lake.data_path, "--metrics", lake.metrics_path,
    ])
    report = run_delete(args, spark=spark)
    assert report["rows_deleted"] == 2 and report["names_banned"] == 1
    assert all(m != "one_min.srv3.cpu" for m, _ in _metrics_left(spark, lake))
