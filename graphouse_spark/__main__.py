"""CLI daemon: ``python -m graphouse_spark`` — the reference's runnable
service (graphouse ships as a jar started with a properties file;
GraphouseWebServer + MetricServer under one process) as one command.

    # serve: HTTP API + graphite TCP ingest under one process
    python -m graphouse_spark serve --data /lake/data --metrics /lake/metrics \
        --checkpoint /lake/ckpt --http-port 2005 --graphite-port 2003 \
        --rollup-xml rollup.xml --index /lake/zonemap

    # batch backfill from graphite plaintext files
    python -m graphouse_spark ingest-file lines.txt --data ... --metrics ...

    # the nightly bundle: autohide -> rollup -> compaction -> index refresh
    python -m graphouse_spark maintain --data ... --metrics ... --index ...

Port parity: 2003 is carbon's plaintext port (MetricServer.java), 2005
graphouse's HTTP port. ``--rollup-xml`` takes the SAME graphite_rollup
XML the reference feeds ClickHouse (doc/install.md:12-152), so a
migrating user reuses their config file unchanged.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="graphouse_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--data", required=True, help="points table path")
        p.add_argument("--metrics", required=True, help="metric-tree table path")
        p.add_argument("--rollup-xml", help="ClickHouse graphite_rollup XML")
        p.add_argument("--index", help="zonemap index path (bloom sidecar rides next to it)")

    serve = sub.add_parser("serve", help="HTTP API + graphite TCP ingest")
    common(serve)
    serve.add_argument("--checkpoint", required=True)
    serve.add_argument("--properties",
                       help="graphouse .properties file (the reference's "
                            "config surface); explicit CLI flags override "
                            "file values")
    serve.add_argument("--host", default=None)
    serve.add_argument("--http-port", type=int, default=None)
    serve.add_argument("--graphite-port", type=int, default=None,
                       help="0 disables the ingest listener")
    serve.add_argument("--pickle-port", type=int, default=0,
                       help="carbon pickle-protocol listener (carbon's :2004); 0 = off")
    serve.add_argument("--trigger-seconds", type=int, default=None)
    serve.add_argument("--events", help="events store path (graphite "
                       "events API + events() render function)")
    serve.add_argument("--tagged-ingest", action="store_true",
                       help="admit graphite 1.1 tagged names "
                            "(name;key=value) on the ingest listeners")
    serve.add_argument("--tags-index", default=None,
                       help="persisted tag index path (default: "
                            "<data>_tags when --tagged-ingest is on); "
                            "serves /tags browsing and seriesByTag "
                            "resolution without scanning the points "
                            "table")
    serve.add_argument("--lazy-tree", action="store_true",
                       help="CH-style cold start: no bootstrap tree scan")
    serve.add_argument("--render-cache-ttl", type=int, default=0,
                       help="seconds to cache identical /render results "
                            "(CH use_query_cache analog); 0 = off")

    ing = sub.add_parser("ingest-file", help="batch backfill from line files")
    common(ing)
    ing.add_argument("files", nargs="+")

    mnt = sub.add_parser("maintain", help="autohide -> rollup -> compaction -> index")
    common(mnt)
    mnt.add_argument("--tags-index", default=None,
                     help="tag index path to compact (distinct rows, "
                          "one sorted file per date)")
    mnt.add_argument("--properties", default=None,
                     help="graphouse .properties file: autohide policy "
                          "(graphouse.autohide.*) and retention-config "
                          "apply to the bundle")

    mig = sub.add_parser("migrate-whisper",
                         help="read a carbon .wsp tree into the lake "
                              "(the reference replaces whisper — this "
                              "is the switchover path)")
    common(mig)
    mig.add_argument("root", help="whisper storage root (dir layout = metric tree)")

    dele = sub.add_parser("delete",
                          help="physically remove matching metrics' data "
                               "rows (CH ALTER DELETE analog) and BAN "
                               "their tree names")
    common(dele)
    dele.add_argument("patterns", nargs="+",
                      help="metric names or globs to delete")
    dele.add_argument("--data-only", action="store_true",
                      help="skip the metrics-table BAN writeback")
    return ap


def _provider(args):
    from graphouse_spark.retention import (
        CombinedRetentionProvider, DefaultRetentionProvider, parse_rollup_xml)

    if args.rollup_xml:
        with open(args.rollup_xml) as f:
            return CombinedRetentionProvider(parse_rollup_xml(f.read()))
    return DefaultRetentionProvider()


def run_serve(args, spark=None, block: bool = True):
    """Wire service + HTTP + ingest; returns (service, http, query) so
    tests drive it in-process; ``block=True`` parks the main thread."""
    from graphouse_spark.api.http import start_http_server
    from graphouse_spark.api.service import GraphouseService
    from graphouse_spark.session import get_spark
    from graphouse_spark.streaming.ingest import IngestConfig, start_socket_ingest

    # the reference's deployment surface: a graphouse.properties file
    # seeds every knob; explicit CLI flags override file values
    settings = None
    if getattr(args, "properties", None):
        from graphouse_spark.config import load_settings

        settings = load_settings(args.properties)

    def pick(cli_value, prop_value, default):
        if cli_value is not None:
            return cli_value
        return prop_value if settings is not None else default

    host = pick(args.host, settings.graphite_host or "127.0.0.1"
                if settings else None, "127.0.0.1")
    # graphouse.http.bind-address is its OWN knob in the reference —
    # the HTTP listener must not inherit the cacher bind-address
    http_host = pick(args.host, settings.http_host or "127.0.0.1"
                     if settings else None, "127.0.0.1")
    http_port = pick(args.http_port,
                     settings.http_port if settings else None, 2005)
    graphite_port = pick(args.graphite_port,
                         settings.graphite_port if settings else None, 2003)
    trigger_seconds = pick(args.trigger_seconds,
                           settings.trigger_seconds if settings else None, 5)
    if settings and settings.retention_config and not args.rollup_xml:
        args.rollup_xml = settings.retention_config

    spark = spark or get_spark("graphouse-serve")
    # first boot on an empty lake: bootstrap an empty metrics table so
    # the daemon serves (empty tree) instead of dying on PATH_NOT_FOUND
    from graphouse_spark.fs import get_fs

    if not get_fs(args.metrics, spark).exists(args.metrics):
        from graphouse_spark.schemas import METRICS_SCHEMA
        from graphouse_spark.sources.tables import write_metrics

        write_metrics(spark.createDataFrame([], METRICS_SCHEMA), args.metrics)
    tagged = getattr(args, "tagged_ingest", False)
    tags_index = getattr(args, "tags_index", None) or (
        args.data.rstrip("/") + "_tags" if tagged else None)
    if (tags_index and not get_fs(tags_index, spark).exists(tags_index)
            and get_fs(args.data, spark).exists(args.data)):
        # serving switches to the index the moment the dir exists, so
        # series ingested BEFORE the index must be backfilled first or
        # they vanish from /tags and seriesByTag
        from graphouse_spark.tags import backfill_tag_index

        n = backfill_tag_index(spark, args.data, tags_index)
        print(f"backfilled tag index: {n} rows -> {tags_index}",
              file=sys.stderr)
    svc = GraphouseService(
        spark, args.data, args.metrics, _provider(args),
        index_path=args.index, lazy_tree=args.lazy_tree,
        events_path=getattr(args, "events", None),
        tags_path=tags_index,
        max_points_per_metric=(settings.max_points_per_metric
                               if settings else -1),
        max_subdirs_per_dir=(settings.max_subdirs_per_dir
                             if settings else -1),
        max_metrics_per_dir=(settings.max_metrics_per_dir
                             if settings else -1),
        max_metrics_per_query=(settings.max_metrics_per_query
                               if settings else -1),
        allow_all_negative_tag_queries=(settings.tags_allow_all_negative
                                        if settings else False),
        batcher_opts=(dict(
            max_parallel=settings.batcher_max_parallel,
            max_batch_size=settings.batcher_max_batch_size,
            batch_aggregation_ms=settings.batcher_aggregation_ms,
        ) if settings else None),
    )
    svc.render_cache_ttl = getattr(args, "render_cache_ttl", 0)
    if not args.lazy_tree:
        svc.load_tree()
    http = start_http_server(svc, host=http_host, port=http_port)
    query = pickle_query = None
    validator = settings.validator() if settings else None
    redirect = ()
    if settings and settings.redirect_enabled and settings.redirect_dir:
        redirect = tuple((p, settings.redirect_dir)
                         for p in settings.redirect_postfixes)
    if graphite_port:
        cfg = IngestConfig(args.data, args.metrics, args.checkpoint,
                           trigger_seconds=trigger_seconds,
                           allow_tags=tagged, validator=validator,
                           tags_path=tags_index, host_redirect=redirect)
        query = start_socket_ingest(spark, cfg, host=host,
                                    port=graphite_port, server_mode=True)
    if getattr(args, "pickle_port", 0):
        # second listener, own checkpoint: both feed the same tables
        pcfg = IngestConfig(args.data, args.metrics,
                            args.checkpoint.rstrip("/") + "-pickle",
                            trigger_seconds=trigger_seconds,
                            allow_tags=tagged, validator=validator,
                            tags_path=tags_index, host_redirect=redirect)
        pickle_query = start_socket_ingest(
            spark, pcfg, host=host, port=args.pickle_port,
            server_mode=True, protocol="pickle")
    print(f"serving http on {http.server_address[0]}:{http.server_address[1]}"
          + (f", graphite on :{graphite_port}" if query else "")
          + (f", pickle on :{args.pickle_port}" if pickle_query else ""),
          file=sys.stderr)
    if block:
        # graphouse.search.refresh-seconds (MetricSearch.java refresh
        # loop): re-resolve the tree on the configured cadence so
        # status changes written by OTHER processes (maintain's
        # autohide, a second daemon) become visible; without a
        # properties file the daemon keeps the prior behavior (its own
        # ingest loop already folds in new names)
        refresh = (settings.search_refresh_seconds
                   if settings and not args.lazy_tree else None)
        try:
            while True:
                time.sleep(refresh or 3600)
                if refresh:
                    try:
                        svc.load_tree()
                    except Exception as exc:  # noqa: BLE001
                        print(f"tree refresh failed: {exc}",
                              file=sys.stderr)
        except KeyboardInterrupt:
            pass
        finally:
            for q in (query, pickle_query):
                if q:
                    q.stop()
            http.shutdown()
    return svc, http, query


def run_ingest_file(args, spark=None) -> int:
    """Backfill graphite plaintext files through the SAME pipeline the
    live socket uses (parse -> validate -> ban check -> data + tree)."""
    from pyspark.sql import functions as F

    from graphouse_spark.session import get_spark
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch
    from graphouse_spark.sources.graphite import parse_lines

    spark = spark or get_spark("graphouse-backfill")
    raw = spark.read.text(args.files).withColumnRenamed("value", "value") \
        .selectExpr("value")
    parsed = parse_lines(raw, updated=F.unix_timestamp())
    cfg = IngestConfig(args.data, args.metrics, checkpoint_path="")
    ingest_batch(parsed, cfg, known_names=None)
    n = parsed.count()
    print(f"ingested {n} lines", file=sys.stderr)
    return n


def run_migrate_whisper(args, spark=None) -> int:
    """Distributed .wsp tree migration through the live ingest pipeline
    (ban checks and tree writeback included) — finest archive wins
    overlapping timestamps; see sources/whisper.py. Corrupt files are
    QUARANTINED (one parquet row each, with the parse error and file
    path, under ``<data>/_whisper_quarantine``), never silently
    dropped and never fatal to the other 999,999 files."""
    from pyspark.sql import functions as F

    from graphouse_spark.session import get_spark
    from graphouse_spark.sources.whisper import read_whisper
    from graphouse_spark.streaming.ingest import IngestConfig, ingest_batch

    import uuid

    spark = spark or get_spark("graphouse-migrate")
    # ONE .wsp parse, materialized as a COLUMNAR staging table that
    # both consumers (ingest + quarantine) and both counts read from.
    # The previous form localCheckpoint-ed the parsed rows — serialized
    # block materialization of the ENTIRE point set, the exact
    # super-linear pathology measured on the tag-index rewrites
    # (sources/tables.py, tags.backfill_tag_index); a parquet stage is
    # the scalable spelling of the same share-one-scan idea.
    stage = args.data.rstrip("/") + f"/_whisper_stage_{uuid.uuid4().hex[:8]}"
    read_whisper(spark, args.root, on_error="quarantine") \
        .write.mode("overwrite").parquet(stage)
    try:
        rows = spark.read.parquet(stage)
        good = rows.where(F.col("error").isNull()).select(
            "name", "timestamp", "value", "updated")
        bad = rows.where(F.col("error").isNotNull()).select("path", "error")
        cfg = IngestConfig(args.data, args.metrics, checkpoint_path="")
        ingest_batch(good, cfg, known_names=None)
        n = good.count()
        n_bad = bad.count()
        if n_bad:
            qpath = args.data.rstrip("/") + "/_whisper_quarantine"
            bad.write.mode("append").parquet(qpath)
            print(f"quarantined {n_bad} corrupt .wsp file(s) -> {qpath}",
                  file=sys.stderr)
    finally:
        # the stage lives INSIDE the (possibly remote) data lake --
        # clean it through the lake's filesystem, not the local one
        from graphouse_spark.fs import get_fs

        get_fs(stage, spark).delete(stage)
    print(f"migrated {n} points from {args.root}", file=sys.stderr)
    return n


def run_delete(args, spark=None) -> dict:
    from graphouse_spark.operators.delete import (
        delete_from_metrics_table,
        delete_metrics,
    )
    from graphouse_spark.session import get_spark

    spark = spark or get_spark("graphouse-delete")
    report = delete_metrics(spark, args.data, args.patterns)
    if not args.data_only:
        report["names_banned"] = delete_from_metrics_table(
            spark, args.metrics, args.patterns)
    print(report, file=sys.stderr)
    return report


def run_maintain(args, spark=None) -> dict:
    from graphouse_spark.maintenance import run_all
    from graphouse_spark.session import get_spark

    spark = spark or get_spark("graphouse-maintain")
    from graphouse_spark.fs import get_fs

    # serve auto-creates the index at <data>_tags under --tagged-ingest;
    # a default maintain run must compact the same default path or the
    # index fragments forever (one file per micro-batch per date)
    tags_path = getattr(args, "tags_index", None)
    if tags_path is None and get_fs(args.data, spark).exists(
            args.data.rstrip("/") + "_tags"):
        tags_path = args.data.rstrip("/") + "_tags"
    ah = {}
    if getattr(args, "properties", None):
        from graphouse_spark.config import load_settings

        settings = load_settings(args.properties)
        if settings.retention_config and not args.rollup_xml:
            args.rollup_xml = settings.retention_config
        ah = dict(autohide_enabled=settings.autohide_enabled,
                  autohide_max_values_count=settings.autohide_max_values_count,
                  autohide_missing_days=settings.autohide_missing_days)
    report = run_all(spark, args.data, args.metrics, _provider(args),
                     index_path=args.index, tags_path=tags_path, **ah)
    print(report, file=sys.stderr)
    return report


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.cmd == "serve":
        run_serve(args)
    elif args.cmd == "ingest-file":
        run_ingest_file(args)
    elif args.cmd == "maintain":
        run_maintain(args)
    elif args.cmd == "migrate-whisper":
        run_migrate_whisper(args)
    elif args.cmd == "delete":
        run_delete(args)


if __name__ == "__main__":
    main()
