"""Streaming ingest: Graphite plaintext -> data + metrics tables.

Replaces the reference's TCP server / micro-batcher / writer pool
(MetricServer.java, MetricCacher.java) with Structured Streaming:

  readStream (socket/text/custom) -> parse+validate (S2/S3)
  -> foreachBatch:
       ban-filter (X7) -> append data parquet (S5)
       new-name anti-join vs known names -> append metrics rows (S7)

Semantics mapping (SURVEY §2.9):
- T2: NO watermark — late/duplicate points are accepted by design
  (gauge resubmission is a feature); conflict resolution stays
  read-time LWW.
- T3: the size/time hybrid trigger becomes ``Trigger.ProcessingTime``;
  checkpointing gives exactly-once ``foreachBatch`` (strictly stronger
  than the reference's at-least-once infinite retry, T7).
- T6: a new point for a HIDDEN/AUTO_HIDDEN metric re-opens it — the
  batch emits SIMPLE rows for previously-hidden names it touches; the
  read-time status lattice keeps BAN sticky.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.sources.graphite import metric_tree_rows, parse_lines, to_data_rows
from graphouse_spark.sources.tables import write_data, write_metrics


@dataclass
class IngestConfig:
    data_path: str
    metrics_path: str
    checkpoint_path: str
    trigger_seconds: int = 5
    banned_prefixes: tuple[str, ...] = ()  # X7 ban check (small, broadcast)
    #: crash-injection hook for recovery tests: called with a named
    #: point ("after_data_write", "after_metrics_write") inside the
    #: micro-batch; raising simulates a mid-batch executor/driver death
    #: (same posture as the rollup/delete commit-protocol tests)
    failpoint: Optional[Callable[[str], None]] = None
    #: opt-in graphite 1.1 tagged-name ingest (tags.py): lines like
    #: ``disk.used;dc=1 v ts`` validate, canonicalize tag order, land
    #: in the data table and skip the tree. Default off — the
    #: reference-parity validator rejects ';'.
    allow_tags: bool = False
    #: name validator override (graphouse.metric-validation.* keys via
    #: config.GraphouseSettings.validator()); None = reference defaults
    validator: Optional[object] = None
    #: persisted tag index path (TAGS_SCHEMA): when set (and
    #: ``allow_tags``), each batch appends (metric, tag, value, date)
    #: rows for its tagged names, so /tags browsing and seriesByTag
    #: name-resolution scan the index instead of the points table
    tags_path: Optional[str] = None
    #: S4 host-metric redirect (graphouse.host-metric-redirect.*):
    #: ((postfix, dir), ...) — ``prefix.host<postfix>.rest`` rewrites
    #: to ``prefix.<dir>.host<postfix>.rest`` at parse time
    host_redirect: tuple = ()


def _parse_stream(raw: DataFrame, cfg: "IngestConfig",
                  updated=None) -> DataFrame:
    """Stream-source parse honoring :attr:`IngestConfig.allow_tags`."""
    if cfg.allow_tags:
        from graphouse_spark import tags as _tags

        parsed = _tags.parse_tagged_lines(raw, updated=updated,
                                          base_validator=cfg.validator)
    else:
        parsed = parse_lines(raw, updated=updated, validator=cfg.validator)
    if cfg.host_redirect:
        from graphouse_spark.sources.graphite import redirect_host_metrics

        parsed = redirect_host_metrics(parsed, dict(cfg.host_redirect))
    return parsed


def filter_banned(parsed: DataFrame, banned_prefixes: tuple[str, ...]) -> DataFrame:
    """Drop metrics under banned dirs (BannedMetricCache.isBanned analog)."""
    if not banned_prefixes:
        return parsed
    cond = None
    for p in banned_prefixes:
        c = F.col("name").startswith(p)
        cond = c if cond is None else (cond | c)
    return parsed.filter(~cond)


def filter_banned_dynamic(parsed: DataFrame, banned: DataFrame | None) -> DataFrame:
    """Drop names whose resolved status (or an ancestor dir's) is BAN.

    The reference refuses values for banned subtrees via the write-path
    trie (BannedMetricCache.isBanned); here the resolved BAN rows are a
    small broadcast side of a left-anti join. Dir names carry a trailing
    dot, so ``startswith`` is an unambiguous subtree match; metric names
    must match exactly (no trailing delimiter to guard the prefix).
    """
    if banned is None:
        return parsed
    b = F.broadcast(banned.select(F.col(banned.columns[0]).alias("_ban")))
    is_dir = F.col("_ban").endswith(".")
    cond = F.when(is_dir, F.col("name").startswith(F.col("_ban"))).otherwise(
        F.col("name") == F.col("_ban")
    )
    return parsed.join(b, cond, "left_anti")


def ingest_batch(batch: DataFrame, cfg: IngestConfig, known_names: DataFrame | None,
                 hidden_names: DataFrame | None = None,
                 banned_names: DataFrame | None = None) -> None:
    """One micro-batch: append points; register new names; un-hide (T6).

    ``known_names``/``hidden_names`` come from the current resolved
    metrics table (may be None on first boot). New-name detection is a
    left-anti join — at scale the names side is orders of magnitude
    smaller than the points side, and the anti-join key (name) is the
    batch's natural clustering.
    """
    batch = filter_banned_dynamic(
        filter_banned(batch, cfg.banned_prefixes), banned_names
    ).cache()
    try:
        write_data(to_data_rows(batch), cfg.data_path)
        if cfg.failpoint is not None:
            cfg.failpoint("after_data_write")

        # tagged names (';' — the opt-in graphite 1.1 extension,
        # tags.py) live in the DATA table only: graphite likewise keeps
        # them out of the hierarchy. A no-op on the standard path — the
        # reference-default validator never admits ';'.
        batch_names = (batch.select("name").distinct()
                       .filter(~F.col("name").contains(";")))
        new_names = (
            batch_names.join(known_names, "name", "left_anti") if known_names is not None else batch_names
        )
        tree_updates = metric_tree_rows(new_names)
        if known_names is not None:
            # ancestor expansion may resurface already-registered dirs
            tree_updates = tree_updates.join(known_names, "name", "left_anti")
        if hidden_names is not None:
            # T6: touched hidden metrics (and their ancestor chain) re-open
            reopened = metric_tree_rows(batch_names.join(hidden_names, "name", "left_semi"))
            tree_updates = tree_updates.unionByName(reopened)
        # the lattice denies illegal flips at read time (BAN stays BAN);
        # SIMPLE rows for still-banned names are filtered by argMax+lattice
        write_metrics(tree_updates, cfg.metrics_path)
        if cfg.failpoint is not None:
            cfg.failpoint("after_metrics_write")

        if cfg.tags_path is not None:
            # persisted tag index: one row per (tagged series, tag)
            # per batch, partitioned by last-seen day. Append-only like
            # the metrics table; read-side distinct collapses repeats,
            # maintenance compaction bounds the file count. Batch
            # crash-replay just re-appends the same rows (distinct-safe).
            from graphouse_spark.sources.tables import write_tags
            from graphouse_spark.tags import tag_index_rows

            tagged = (batch.filter(F.col("name").contains(";"))
                      .groupBy("name").agg(F.max("updated").alias("updated")))
            write_tags(tag_index_rows(tagged), cfg.tags_path)
            if cfg.failpoint is not None:
                cfg.failpoint("after_tags_write")
    finally:
        batch.unpersist()


def _batch_runner(spark: SparkSession, cfg: IngestConfig):
    """The foreachBatch body shared by every ingest source: resolve
    the current name statuses (known / hidden / banned) from the
    metrics table, then run :func:`ingest_batch`."""
    from graphouse_spark.operators.dedup import latest_status
    from graphouse_spark.sources.tables import read_metrics

    def run(batch: DataFrame, batch_id: int) -> None:
        from graphouse_spark.fs import get_fs

        # reads are lazy; probe eagerly (via the table's Hadoop FS)
        if get_fs(cfg.metrics_path, spark).exists(cfg.metrics_path):
            resolved = latest_status(read_metrics(spark, cfg.metrics_path))
            known = resolved.select("name")
            hidden = resolved.filter(
                F.col("status").isin("HIDDEN", "AUTO_HIDDEN")).select("name")
            banned = resolved.filter(F.col("status") == "BAN").select("name")
        else:  # first batch: table does not exist yet
            known = hidden = banned = None
        ingest_batch(batch, cfg, known, hidden, banned)

    return run


def start_file_ingest(spark: SparkSession, cfg: IngestConfig, input_dir: str,
                      clean_source: str | None = None):
    """Ingest graphite plaintext from a directory of line files.

    The durable-source topology: unlike the socket source (which
    cannot replay data lost in a crash — the reference compensates
    with MetricCacher.java's in-memory infinite retry,
    MetricCacher.java:266-303), the file source + checkpoint replays
    an uncommitted micro-batch after a restart, so a mid-batch death
    loses nothing. Replayed appends are duplicate rows in the data
    table; read-time LWW (operators/dedup.dedup_points) collapses
    them — at-least-once delivery, exactly-once query results.

    ``clean_source``: Spark's file-source post-processing for consumed
    files — ``"delete"`` or ``"archive"``. A long-running spool-fed
    stream MUST set it: without cleanup the directory listing grows
    without bound and batch planning degrades (the streaming small-file
    problem). Cleanup happens only after the micro-batch commits, so
    replay-ability is preserved.

    Returns the StreamingQuery; caller owns lifecycle.
    """
    reader = spark.readStream
    if clean_source is not None:
        reader = reader.option("cleanSource", clean_source)
    raw = reader.text(input_dir)
    parsed = _parse_stream(raw, cfg)
    return (
        parsed.writeStream.foreachBatch(_batch_runner(spark, cfg))
        .option("checkpointLocation", cfg.checkpoint_path)
        .trigger(processingTime=f"{cfg.trigger_seconds} seconds")
        .start()
    )


def start_spooled_socket_ingest(spark: SparkSession, cfg: IngestConfig,
                                spool_dir: str, host: str = "0.0.0.0",
                                port: int = 2003, protocol: str = "line",
                                flush_seconds: float = 1.0,
                                clean_source: str | None = "delete"):
    """Live TCP ingest with a durable floor: a :class:`SpoolServer`
    appends received lines to ``spool_dir`` as fsync'd atomic files,
    and the PROVEN checkpointed file path (:func:`start_file_ingest`,
    crash-resume e2e in tests/test_ingest.py) consumes them. A crash
    anywhere after the spool flush loses nothing; the remaining loss
    window is lines received but not yet flushed (≤ ``flush_seconds``),
    versus the reference's whole in-memory cache
    (MetricCacher.java:97,266-303 — survives insert failure, not
    process death).

    One divergence from the direct socket source: ``updated`` (T1
    arrival time) becomes the spool-consume time rather than the
    socket-read time — at most one trigger later, the same skew the
    reference's retry loop introduces on every failed insert.

    Returns ``(server, query)``; caller owns both lifecycles (stop the
    query first, then the server).
    """
    from graphouse_spark.streaming.spool import LineSpool, SpoolServer

    spool = LineSpool(spool_dir, flush_seconds=flush_seconds)
    server = SpoolServer(spool, host=host, port=port, protocol=protocol)
    try:
        query = start_file_ingest(spark, cfg, spool_dir,
                                  clean_source=clean_source)
    except Exception:
        # Don't leak the bound port / flusher thread when the stream
        # fails to start (bad checkpoint, conf error).
        server.stop()
        raise
    return server, query


def start_socket_ingest(spark: SparkSession, cfg: IngestConfig, host: str = "localhost",
                        port: int = 2003, server_mode: bool = False,
                        protocol: str = "line"):
    """Wire the pipeline to live TCP (the reference's ingestion daemon).

    ``server_mode=False``: Spark's socket source (we dial out — handy in
    tests). ``server_mode=True``: the custom ``graphite`` DataSource —
    WE listen and any number of producers connect, the reference's
    topology (MetricServer.java). Everything after ``parse_lines`` is
    source-agnostic; swap in kafka/files the same way.

    Returns the StreamingQuery; caller owns lifecycle.
    """
    if server_mode:
        from graphouse_spark.sources.graphite_source import GraphiteDataSource

        spark.dataSource.register(GraphiteDataSource)
        raw = (
            spark.readStream.format("graphite")
            .option("host", host)
            .option("port", str(port))
            .option("protocol", protocol)  # line (:2003) or carbon pickle (:2004)
            .load()
        )
        parsed = _parse_stream(raw, cfg, updated=F.col("updated"))
    else:
        raw = (
            spark.readStream.format("socket")
            .option("host", host)
            .option("port", port)
            .load()
        )
        parsed = _parse_stream(raw, cfg)

    return (
        parsed.writeStream.foreachBatch(_batch_runner(spark, cfg))
        .option("checkpointLocation", cfg.checkpoint_path)
        .trigger(processingTime=f"{cfg.trigger_seconds} seconds")
        .start()
    )
