"""Ingest path: line parsing (S2/S3), batch ingest (S5/S7/T6), socket e2e (S1)."""

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.dedup import latest_status
from graphouse_spark.sources.graphite import metric_tree_rows, parse_lines, to_data_rows
from graphouse_spark.sources.tables import read_data, read_metrics
from graphouse_spark.streaming.ingest import IngestConfig, filter_banned, ingest_batch


def lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "value string")


def test_parse_lines(spark):
    raw = lines_df(spark, [
        "one_min.srv1.cpu 42.5 1542199500",          # ok
        "one_min.srv1.cpu 42.5 1542199500.6",        # float ts -> rounded
        "one_min.srv1.mem nan 1542199500",           # non-finite -> drop
        "one_min.srv1.cpu 1.0 0",                    # ts <= 0 -> drop
        "one_min.srv1.cpu 1.0 -5",                   # negative -> drop
        "bad..name 1.0 1542199500",                  # invalid name -> drop
        "a.b 1.0 1542199500",                        # too short/few levels -> drop
        "one_min.srv1.cpu 42.5",                     # missing field -> drop
        "one_min.srv1.cpu x 1542199500",             # non-numeric value -> drop
        "  one_min.srv2.cpu 7 1542199501  ",         # whitespace tolerated
    ])
    got = parse_lines(raw, updated=F.lit(1000)).collect()
    rows = {(r["name"], r["value"], r["timestamp"]) for r in got}
    assert rows == {
        ("one_min.srv1.cpu", 42.5, 1542199500),
        ("one_min.srv1.cpu", 42.5, 1542199501),  # 1542199500.6 rounds up
        ("one_min.srv2.cpu", 7.0, 1542199501),
    }
    assert all(r["updated"] == 1000 for r in got)


def test_metric_tree_rows(spark):
    names = spark.createDataFrame([("one_min.srv1.cpu.load",)], "name string")
    rows = {r["name"]: r for r in metric_tree_rows(names).collect()}
    assert set(rows) == {"one_min.", "one_min.srv1.", "one_min.srv1.cpu.", "one_min.srv1.cpu.load"}
    assert rows["one_min.srv1.cpu.load"]["parent"] == "one_min.srv1.cpu."
    assert rows["one_min.srv1.cpu.load"]["level"] == 4
    assert rows["one_min.srv1.cpu."]["level"] == 3
    assert rows["one_min."]["parent"] == ""
    assert all(r["status"] == "SIMPLE" for r in rows.values())


def test_filter_banned(spark):
    parsed = parse_lines(lines_df(spark, [
        "one_min.bad.metric 1 1542199500",
        "one_min.good.metric 2 1542199500",
    ]), updated=F.lit(1))
    kept = filter_banned(parsed, ("one_min.bad.",)).collect()
    assert [r["name"] for r in kept] == ["one_min.good.metric"]


def test_ingest_batch_roundtrip(spark, tmp_path):
    cfg = IngestConfig(
        data_path=str(tmp_path / "data"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    batch1 = parse_lines(lines_df(spark, [
        "one_min.srv1.cpu 1.0 1542199500",
        "one_min.srv1.mem 2.0 1542199500",
    ]), updated=F.lit(100))
    ingest_batch(batch1, cfg, known_names=None)

    data = read_data(spark, cfg.data_path)
    assert data.count() == 2
    tree = latest_status(read_metrics(spark, cfg.metrics_path))
    assert tree.count() == 4  # 2 metrics + srv1 dir + one_min dir

    # second batch: one known, one new name -> only the new chain appended
    known = tree.select("name")
    batch2 = parse_lines(lines_df(spark, [
        "one_min.srv1.cpu 3.0 1542199560",
        "one_min.srv2.cpu 4.0 1542199560",
    ]), updated=F.lit(200))
    ingest_batch(batch2, cfg, known_names=known)
    assert read_data(spark, cfg.data_path).count() == 4
    tree2 = latest_status(read_metrics(spark, cfg.metrics_path))
    assert tree2.count() == 6  # + srv2 dir + srv2.cpu
    # duplicate names were not re-registered
    assert read_metrics(spark, cfg.metrics_path).count() == 6


@pytest.mark.slow
def test_socket_ingest_e2e(spark, tmp_path):
    """S1 end-to-end: TCP server -> socket stream -> parquet tables."""
    from graphouse_spark.streaming.ingest import start_socket_ingest

    lines = [f"one_min.host{i % 3}.cpu {i}.5 {1542199500 + i}\n" for i in range(50)]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("localhost", 0))
    port = server.getsockname()[1]
    server.listen(1)

    def serve():
        conn, _ = server.accept()
        with conn:
            for line in lines:
                conn.sendall(line.encode())
            time.sleep(8)  # keep the socket open across a trigger

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    cfg = IngestConfig(
        data_path=str(tmp_path / "data"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    query = start_socket_ingest(spark, cfg, "localhost", port)
    try:
        deadline = time.time() + 90
        n, names = 0, set()
        while time.time() < deadline:
            try:
                n = read_data(spark, cfg.data_path).count()
                names = {r["name"] for r in latest_status(read_metrics(spark, cfg.metrics_path)).collect()}
            except Exception:
                pass
            if n >= 50 and "one_min.host0.cpu" in names:
                break
            time.sleep(1)
        assert n >= 50, f"only {n} rows ingested"
        assert "one_min.host0.cpu" in names and "one_min." in names
    finally:
        query.stop()
        server.close()


def test_redirect_host_metrics(spark):
    from graphouse_spark.sources.graphite import redirect_host_metrics

    parsed = parse_lines(lines_df(spark, [
        "one_min.msh01d_market_yandex_net.cpu.load 1 1542199500",
        "one_min.front01.cpu.load 2 1542199500",
    ]), updated=F.lit(1))
    out = {r["name"] for r in redirect_host_metrics(parsed, {"_market_yandex_net": "market-hosts"}).collect()}
    assert out == {
        "one_min.market-hosts.msh01d_market_yandex_net.cpu.load",
        "one_min.front01.cpu.load",
    }


def test_parse_lines_rejects_infinity(spark):
    # Spark casts 'Infinity'/'-Infinity'/overflowing literals to valid
    # doubles; the reference's Double.isFinite check must drop them.
    raw = lines_df(spark, [
        "one_min.srv1.a Infinity 1542199500",
        "one_min.srv1.b -Infinity 1542199500",
        "one_min.srv1.c 1e400 1542199500",     # overflows to +inf
        "one_min.srv1.d 1.0 1542199500",
    ])
    got = parse_lines(raw, updated=F.lit(1)).collect()
    assert [r["name"] for r in got] == ["one_min.srv1.d"]


def test_dynamic_ban_blocks_new_names(spark, tmp_path):
    # A brand-new metric under a BANned directory must be refused on
    # ingest (the reference's BannedMetricCache subtree check), not just
    # names on the static cfg.banned_prefixes list.
    from graphouse_spark.streaming.ingest import filter_banned_dynamic

    cfg = IngestConfig(
        data_path=str(tmp_path / "data"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    banned = spark.createDataFrame(
        [("one_min.bad.",), ("one_min.ok.exactmetric",)], "name string"
    )
    batch = parse_lines(lines_df(spark, [
        "one_min.bad.newmetric 1.0 1542199500",    # new name under banned dir
        "one_min.ok.exactmetric 2.0 1542199500",   # exactly-banned metric
        "one_min.ok.exactmetric2 2.5 1542199500",  # prefix of a banned METRIC is ok
        "one_min.good.metric 3.0 1542199500",
    ]), updated=F.lit(100))

    kept = filter_banned_dynamic(batch, banned)
    assert sorted(r["name"] for r in kept.collect()) == [
        "one_min.good.metric", "one_min.ok.exactmetric2",
    ]

    ingest_batch(batch, cfg, known_names=None, banned_names=banned)
    data_metrics = {r["metric"] for r in read_data(spark, cfg.data_path).collect()}
    assert data_metrics == {"one_min.good.metric", "one_min.ok.exactmetric2"}
    tree_names = {r["name"] for r in read_metrics(spark, cfg.metrics_path).collect()}
    assert "one_min.bad.newmetric" not in tree_names
    assert "one_min.bad." not in tree_names


@pytest.mark.slow
def test_ingest_crash_resume(spark, tmp_path):
    """T7 crash-resume e2e: kill the stream mid-batch (after the data
    write, before the tree write), restart from the checkpoint, and
    prove no point is lost and no duplicate survives beyond read-time
    LWW. The reference survives the same failure by holding the batch
    in memory and retrying forever (MetricCacher.java:266-303); the
    checkpointed file source replays the uncommitted batch instead."""
    import os
    from dataclasses import replace

    from graphouse_spark.operators.dedup import dedup_points
    from graphouse_spark.streaming.ingest import start_file_ingest

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    lines = [f"one_min.host{i % 3}.cpu {i}.5 {1542199500 + 60 * i}"
             for i in range(50)]
    (input_dir / "batch0.txt").write_text("\n".join(lines) + "\n")

    crash_marker = tmp_path / "crashed"

    def boom(point: str) -> None:
        if point == "after_data_write" and not crash_marker.exists():
            crash_marker.touch()
            raise RuntimeError("injected crash after data write")

    cfg = IngestConfig(
        data_path=str(tmp_path / "data"),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_path=str(tmp_path / "ckpt"),
        trigger_seconds=1,
        failpoint=boom,
    )
    q = start_file_ingest(spark, cfg, str(input_dir))
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
    assert crash_marker.exists(), "failpoint never fired"
    # the crash landed between the two writes: points are durable,
    # the tree is not — exactly the torn state recovery must heal
    assert read_data(spark, cfg.data_path).count() == 50
    assert not os.path.exists(cfg.metrics_path)

    # restart from the same checkpoint, no failpoint: Spark replays
    # the uncommitted batch from the durable file source
    q2 = start_file_ingest(spark, replace(cfg, failpoint=None), str(input_dir))
    try:
        deadline = time.time() + 120
        names: set[str] = set()
        while time.time() < deadline:
            if os.path.exists(cfg.metrics_path):
                names = {r["name"] for r in latest_status(
                    read_metrics(spark, cfg.metrics_path)).collect()}
                if "one_min.host0.cpu" in names:
                    break
            time.sleep(1)
        assert "one_min.host0.cpu" in names and "one_min." in names
    finally:
        q2.stop()

    # at-least-once delivery: the replay appended the batch again...
    raw = read_data(spark, cfg.data_path)
    assert raw.count() == 100
    # ...and read-time LWW collapses it to exactly the 50 sent points
    deduped = dedup_points(raw)
    assert deduped.count() == 50
    got = {(r["metric"], r["ts"]) for r in
           deduped.select("metric", F.col("timestamp").alias("ts")).collect()}
    sent = {(l.split()[0], int(l.split()[2])) for l in lines}
    assert got == sent
