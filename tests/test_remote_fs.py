"""Round-11 verdict #8 (stretch): the whole storage engine driven
against a ``file://``-scheme Hadoop root — the same code path an HDFS
deployment takes (every commit/probe/listing goes through the Hadoop
FileSystem of the table path since the round-12 fs.py port; nothing
falls back to ``os.*``). Local-path tests elsewhere prove semantics;
this suite proves the QUALIFIED-URI spelling of every protocol:

- ingest (data + metrics + tag index appends),
- nightly maintenance: rollup commit protocol, metrics compaction
  staged swap, tag-index rewrite (stage/swap/sub-index), zonemap +
  bloom refresh,
- serving: tree search, render, seriesByTag on the index,
- delete mutation through the shared partition commit protocol.
"""

import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark import tags as T
from graphouse_spark.retention import (
    CombinedRetentionProvider,
    MetricRetention,
    MetricRetentionConfig,
)
from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

PROVIDER = CombinedRetentionProvider(
    [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60, 86400: 300}))])

BASE = 1_542_199_500  # 2018-11-14 — old enough that rollup compacts it


def test_engine_e2e_on_file_scheme_root(spark, tmp_path):
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.maintenance import run_all
    from graphouse_spark.operators.delete import delete_metrics
    from graphouse_spark.sources.tables import (
        read_data, read_tag_values, read_tags)

    root = f"file://{tmp_path}"
    cfg = IngestConfig(f"{root}/data", f"{root}/metrics", "",
                       allow_tags=True, tags_path=f"{root}/tags")
    now = int(time.time())
    lines = [
        # aged points (rollup target) + fresh ones, tagged + untagged
        f"one_min.srv.cpu 1.0 {BASE}",
        f"one_min.srv.cpu 2.0 {BASE + 30}",
        f"one_min.srv.req 5.0 {BASE}",
        f"disk.used;rack=r9;datacenter=dc1 10.0 {now - 120}",
        f"disk.used;rack=r9;datacenter=dc1 11.0 {now - 60}",
        f"one_min.fresh.cpu 3.0 {now - 60}",
    ]
    raw = spark.createDataFrame([(line,) for line in lines], "value string")
    ingest_batch(T.parse_tagged_lines(raw, updated=F.lit(now)), cfg,
                 known_names=None)
    assert read_data(spark, cfg.data_path).count() == 6
    assert read_tags(spark, cfg.tags_path).count() > 0

    # nightly bundle on the URI root: rollup (partition commit
    # protocol), metrics compaction (staged swap), tags compaction
    # (rewrite_tags_atomic), zonemap + bloom refresh
    report = run_all(spark, cfg.data_path, cfg.metrics_path, PROVIDER,
                     now_seconds=now, index_path=f"{root}/zonemap",
                     tags_path=cfg.tags_path, autohide_enabled=False)
    assert report["rolled_partitions"] == ["2018-11-14"]
    # 300 s buckets at 10+ days of age: the two cpu points collapse
    aged = read_data(spark, cfg.data_path).filter(
        F.col("date") == "2018-11-14")
    assert aged.filter(F.col("metric") == "one_min.srv.cpu").count() == 1
    assert report["zonemap_rows"] > 0 and report["bloom_rows"] > 0
    # tag sub-index survived the URI-path rewrite
    assert read_tag_values(spark, cfg.tags_path) is not None

    # serve from the URI root: tree search, render, seriesByTag
    svc = GraphouseService(spark, cfg.data_path, cfg.metrics_path, PROVIDER,
                           index_path=f"{root}/zonemap",
                           tags_path=cfg.tags_path)
    svc.load_tree()
    assert "one_min." in svc.search("*")
    out = svc.render("one_min.fresh.cpu", now - 300, now)
    assert [s["target"] for s in out] == ["one_min.fresh.cpu"]
    assert any(v is not None for v, _ in out[0]["datapoints"])
    series = svc.render("seriesByTag('name=disk.used', 'datacenter=dc1')",
                        now - 300, now)
    assert [s["target"] for s in series] == [
        "disk.used;datacenter=dc1;rack=r9"]

    # delete mutation commits through the same partition protocol
    rep = delete_metrics(spark, cfg.data_path, "one_min.srv.req")
    assert rep["rows_deleted"] == 1
    remaining = {r["metric"] for r in
                 read_data(spark, cfg.data_path).select("metric")
                 .distinct().collect()}
    assert "one_min.srv.req" not in remaining
    assert "one_min.srv.cpu" in remaining


def test_rewrite_tags_atomic_on_file_scheme_root(spark, tmp_path):
    """The most rename-heavy protocol (two-level stage/swap/carry-over)
    driven directly on a qualified URI, including the crash cleanup of
    leftover stage dirs from a previous run."""
    from graphouse_spark.fs import get_fs
    from graphouse_spark.sources.tables import (
        read_tags, rewrite_tags_atomic, write_tags)

    root = f"file://{tmp_path}"
    tags_path = f"{root}/tags"
    rows = spark.createDataFrame(
        [("a;dc=1", "name", "a", "2023-11-14"),
         ("a;dc=1", "dc", "1", "2023-11-14"),
         ("b;dc=2", "name", "b", "2023-11-14"),
         ("b;dc=2", "dc", "2", "2023-11-14")],
        "metric string, tag string, value string, date string"
    ).withColumn("date", F.to_date("date"))
    write_tags(rows, tags_path)
    # plant a leftover stage dir from a "crashed" prior rewrite: the
    # next rewrite must clear it through the same FileSystem
    fs = get_fs(tags_path, spark)
    leftover = f"{root}/.stage-tags-deadbeef"
    fs.mkdirs(leftover)
    n = rewrite_tags_atomic(
        spark, tags_path, lambda idx: idx.filter(F.col("metric") != "b;dc=2"))
    assert n == 2
    assert not fs.exists(leftover)
    kept = {r["metric"] for r in read_tags(spark, tags_path).collect()}
    assert kept == {"a;dc=1"}


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_metrics_compaction_crash_recovery_any_scheme(spark, tmp_path,
                                                      scheme, monkeypatch):
    """The metrics-table staged swap heals from a crash between its two
    renames on both path spellings (the pre-r12 tempdir form had a
    window that lost the table outright)."""
    from graphouse_spark.fs import Fs
    from graphouse_spark.maintenance import run_metrics_compaction
    from graphouse_spark.sources.tables import read_metrics, write_metrics

    lpath = str(tmp_path / "metrics")
    path = scheme + lpath
    rows = spark.createDataFrame(
        [("a.b", 2, "a.", "SIMPLE", 100), ("a.b", 2, "a.", "HIDDEN", 200),
         ("a.c", 2, "a.", "SIMPLE", 100)],
        "name string, level int, parent string, status string, updated long"
    ).withColumn("updated", F.col("updated").cast("timestamp"))
    write_metrics(rows, path)

    real_rename = Fs.rename
    fired = {"n": 0}

    def crashing(self, src, dst):
        real_rename(self, src, dst)
        if fired["n"] == 0:
            fired["n"] += 1
            raise OSError("injected crash after live->bak")

    monkeypatch.setattr(Fs, "rename", crashing)
    with pytest.raises(OSError, match="injected"):
        run_metrics_compaction(spark, path)
    monkeypatch.setattr(Fs, "rename", real_rename)

    # table is mid-swap (live renamed away); the next run recovers and
    # completes — one latest row per name
    n = run_metrics_compaction(spark, path)
    assert n == 2
    latest = {(r["name"], r["status"])
              for r in read_metrics(spark, path).collect()}
    assert latest == {("a.b", "HIDDEN"), ("a.c", "SIMPLE")}


def test_spool_drains_onto_qualified_uri_lake(spark, tmp_path):
    """Round-12 verdict #8 (stretch): the one seam the remote-FS e2e
    did not cross — a NODE-LOCAL spool (by design: fsync semantics need
    local disk; the documented os.rename exception in spool.py) drained
    by the checkpointed file source into a ``file://``-scheme lake.
    The spool side stays local paths; every lake write (data, metrics,
    tag index + sub-indexes) lands through the Hadoop FS of a
    qualified URI."""
    import os

    from graphouse_spark.sources.tables import (
        read_data, read_metrics, read_tag_metrics, read_tag_values,
        read_tags)
    from graphouse_spark.streaming.ingest import (
        IngestConfig, start_file_ingest)

    spool_dir = tmp_path / "spool"
    os.makedirs(spool_dir)
    now = int(time.time())
    lines = [f"one_min.host{i}.cpu {i}.5 {now - 60 * i}" for i in range(5)]
    lines.append(f"disk.used;rack=r1 9.0 {now - 30}")
    root = f"file://{tmp_path}"
    cfg = IngestConfig(
        data_path=f"{root}/data",
        metrics_path=f"{root}/metrics",
        checkpoint_path=f"{root}/ckpt",
        trigger_seconds=1,
        allow_tags=True,
        tags_path=f"{root}/tags",
    )

    from graphouse_spark.streaming.spool import LineSpool

    spool = LineSpool(str(spool_dir), flush_seconds=999)
    spool.append(lines)
    assert spool.flush() is not None

    q = start_file_ingest(spark, cfg, str(spool_dir))
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                # the tag index is the LAST write of the micro-batch —
                # polling on it avoids stopping the stream mid-batch
                if read_tags(spark, cfg.tags_path).count() > 0:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    assert read_data(spark, cfg.data_path).count() == 6
    assert read_metrics(spark, cfg.metrics_path).count() > 0
    assert read_tags(spark, cfg.tags_path).count() > 0
    vals = read_tag_values(spark, cfg.tags_path)
    assert vals is not None and vals.count() > 0
    mets = read_tag_metrics(spark, cfg.tags_path)
    assert mets is not None and {r["metric"] for r in mets.collect()} == {
        "disk.used;rack=r1"}
