"""Custom graphite DataSource: producers connect to US (server topology)."""

import socket
import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark.sources.graphite import parse_lines


@pytest.mark.slow
def test_graphite_source_e2e(spark, tmp_path):
    from graphouse_spark.sources.graphite_source import GraphiteDataSource, GraphiteStreamReader

    spark.dataSource.register(GraphiteDataSource)
    # bind an ephemeral port first so the test knows where to connect:
    # instantiate reader options through the stream; use port 0 via option
    # is not visible back, so pick a free port manually
    probe = socket.socket()
    probe.bind(("localhost", 0))
    port = probe.getsockname()[1]
    probe.close()

    raw = (
        spark.readStream.format("graphite")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .load()
    )
    parsed = parse_lines(raw, updated=F.col("updated"))
    out_path = str(tmp_path / "out")
    query = (
        parsed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        # two producers connect and push lines (incl. garbage)
        deadline = time.time() + 30
        sent = 0
        for attempt in range(50):
            try:
                c1 = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                time.sleep(0.5)
        c2 = socket.create_connection(("127.0.0.1", port), timeout=5)
        for i in range(40):
            c1.sendall(f"one_min.p1.metric {i} {1542199500 + i}\n".encode())
            sent += 1
        c2.sendall(b"garbage line\n")
        for i in range(40):
            c2.sendall(f"one_min.p2.metric {i} {1542199500 + i}\n".encode())
            sent += 1
        c1.close()
        c2.close()

        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out_path).count()
            except Exception:
                n = 0
            if n >= 80:
                break
            time.sleep(1)
        assert n >= 80, f"only {n} of 80 valid lines arrived"
        got = spark.read.parquet(out_path)
        names = {r["name"] for r in got.select("name").distinct().collect()}
        assert names == {"one_min.p1.metric", "one_min.p2.metric"}
        assert got.filter(F.col("updated") <= 0).count() == 0
    finally:
        query.stop()


@pytest.mark.slow
def test_graphite_pickle_protocol_e2e(spark, tmp_path):
    """carbon pickle receiver (:2004 protocol): length-framed pickled
    batches of (metric, (ts, value)) land through the shared pipeline;
    hostile frames (globals) and corrupt frames are dropped."""
    import pickle
    import struct

    from graphouse_spark.sources.graphite_source import GraphiteDataSource

    spark.dataSource.register(GraphiteDataSource)
    probe = socket.socket()
    probe.bind(("localhost", 0))
    port = probe.getsockname()[1]
    probe.close()

    raw = (
        spark.readStream.format("graphite")
        .option("host", "127.0.0.1")
        .option("port", str(port))
        .option("protocol", "pickle")
        .load()
    )
    parsed = parse_lines(raw, updated=F.col("updated"))
    out_path = str(tmp_path / "out")
    query = (
        parsed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        for attempt in range(50):
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=2)
                break
            except OSError:
                time.sleep(0.5)

        def frame(payload: bytes) -> bytes:
            return struct.pack("!L", len(payload)) + payload

        batch = [(f"one_min.pk.m{i}", (1542199500 + i, float(i))) for i in range(30)]
        c.sendall(frame(pickle.dumps(batch, protocol=2)))
        # a hostile frame referencing a global must be rejected, not run
        evil = pickle.dumps(time.time, protocol=2)
        c.sendall(frame(evil))
        # and a second good batch after the bad one still lands
        batch2 = [(f"one_min.pk.n{i}", (1542199600 + i, float(i))) for i in range(10)]
        c.sendall(frame(pickle.dumps(batch2, protocol=2)))
        c.close()

        deadline = time.time() + 45
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out_path).count()
            except Exception:
                n = 0
            if n >= 40:
                break
            time.sleep(1)
        assert n >= 40, f"only {n} of 40 pickled datapoints arrived"
        got = spark.read.parquet(out_path)
        assert got.filter(F.col("name") == "one_min.pk.m7").count() == 1
        assert got.filter(F.col("name") == "one_min.pk.n3").count() == 1
    finally:
        query.stop()
