"""Nightly maintenance bundle: autohide + rollup + name-table compaction."""

from pyspark.sql import functions as F

from graphouse_spark.maintenance import run_all, run_metrics_compaction
from graphouse_spark.retention import CombinedRetentionProvider, MetricRetention, MetricRetentionConfig
from graphouse_spark.sources.graphite import parse_lines
from graphouse_spark.sources.tables import read_data, read_metrics
from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

import time

# anchor to the wall clock: tree rows are stamped current_timestamp() at
# ingest, and autohide's AUTO_HIDDEN row must version-win over them
NOW = int(time.time())
BASE = NOW - 30 * 86400

PROVIDER = CombinedRetentionProvider(
    [MetricRetentionConfig(".*", True, MetricRetention("avg", {0: 60, 86400: 3600}))]
)


def test_run_all(spark, tmp_path):
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"), str(tmp_path / "ckpt"))
    # old dense metric (rolled up, kept) + old sparse metric (autohidden)
    lines = [f"one_min.dense.cpu {i % 7}.0 {BASE + i * 60}" for i in range(500)]
    lines += [f"one_min.sparse.cpu 1.0 {BASE}"]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    pre_metrics_rows = read_metrics(spark, cfg.metrics_path).count()
    pre_data_rows = read_data(spark, cfg.data_path).count()

    # maintenance "now" sits after the ingest wall-clock stamps so its
    # status rows version-win (as they would on a real schedule)
    report = run_all(spark, cfg.data_path, cfg.metrics_path, PROVIDER,
                     now_seconds=int(time.time()) + 10,
                     index_path=str(tmp_path / "zonemap"))

    assert report["autohidden"] == 1  # the sparse metric
    # zonemap refreshed last: it indexes exactly the post-rollup files
    from graphouse_spark.sources.skipping import _data_files, read_file_index

    zm = read_file_index(spark, str(tmp_path / "zonemap"))
    assert report["zonemap_rows"] == zm.count() > 0
    assert {r[0] for r in zm.select("file").distinct().collect()} == set(
        _data_files(cfg.data_path)
    )
    assert len(report["rolled_partitions"]) >= 1
    # rollup shrank 60s points into 3600s buckets
    assert read_data(spark, cfg.data_path).count() < pre_data_rows
    # compaction resolved the appended AUTO_HIDDEN row into one row per name
    assert report["metrics_rows"] == pre_metrics_rows
    resolved = read_metrics(spark, cfg.metrics_path)
    assert resolved.count() == pre_metrics_rows
    status = {r["name"]: r["status"] for r in resolved.collect()}
    assert status["one_min.sparse.cpu"] == "AUTO_HIDDEN"
    assert status["one_min.dense.cpu"] == "SIMPLE"


def test_metrics_compaction_idempotent(spark, tmp_path):
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"), str(tmp_path / "ckpt"))
    raw = spark.createDataFrame([(f"one_min.a.b {i} {BASE + i}",) for i in range(3)], "value string")
    ingest_batch(parse_lines(raw, updated=F.lit(BASE)), cfg, known_names=None)
    n1 = run_metrics_compaction(spark, cfg.metrics_path)
    n2 = run_metrics_compaction(spark, cfg.metrics_path)
    assert n1 == n2 == read_metrics(spark, cfg.metrics_path).count()


def test_tags_compaction_dedupes_and_bounds_files(spark, tmp_path):
    """Ingest re-appends an active series' tag rows every batch; the
    maintenance compaction restores one distinct row per
    (metric, tag, value, date) with a bounded (tag, value)-hashed file
    count per date partition, and the browse answers are unchanged."""
    import os

    from pyspark.sql import functions as F

    from graphouse_spark import tags as T
    from graphouse_spark.maintenance import run_tags_compaction
    from graphouse_spark.sources.tables import read_tags
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    BASE = 1_542_199_500
    cfg = IngestConfig(str(tmp_path / "data"), str(tmp_path / "metrics"),
                       str(tmp_path / "ckpt"),
                       allow_tags=True, tags_path=str(tmp_path / "tags"))
    raw = spark.createDataFrame(
        [(f"disk.used;rack=r1;datacenter=dc1 1.0 {BASE}",)], "value string")
    batch = T.parse_tagged_lines(raw, updated=F.lit(BASE))
    for _ in range(4):  # four micro-batches, same active series
        ingest_batch(batch, cfg, known_names=None)
    before = read_tags(spark, cfg.tags_path)
    assert before.count() == 12  # 3 tags x 4 appends

    n = run_tags_compaction(spark, cfg.tags_path)
    assert n == 3
    after = read_tags(spark, cfg.tags_path)
    assert after.count() == 3
    assert {(r["tag"], r["value"]) for r in after.collect()} == {
        ("name", "disk.used"), ("rack", "r1"), ("datacenter", "dc1")}
    # bounded files per date partition: the bulk layout hashes by
    # (date, tag, value) so whole-tag slice scans parallelize at the
    # 10M-name envelope — at most one non-empty file per distinct
    # (tag, value) pair here (3), far below the 4-per-append sprawl
    [ddir] = [d for d in os.listdir(cfg.tags_path) if d.startswith("date=")]
    files = [f for f in os.listdir(os.path.join(cfg.tags_path, ddir))
             if f.endswith(".parquet")]
    assert 1 <= len(files) <= 3
    # missing index path is a no-op, not an error
    assert run_tags_compaction(spark, str(tmp_path / "nope")) == 0
