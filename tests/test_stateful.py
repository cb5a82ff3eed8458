"""applyInPandasWithState: per-metric EWMA anomaly stream, state across batches."""

import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark.schemas import LINE_SCHEMA
from graphouse_spark.streaming.stateful import ewma_anomalies


@pytest.mark.slow
def test_ewma_anomaly_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    base = 1_542_199_500

    # batch 1: steady signal for two metrics. ONE file per batch
    # (coalesce(1)): with maxFilesPerTrigger=1 each row would otherwise
    # land in its own single-row file/micro-batch, and the file-source
    # orders those by modification time — nondeterministic under suite
    # load, scrambling the EWMA input order (a run of equal values
    # collapses the variance and a steady point then alarms spuriously).
    rows1 = [("m.a.x", 10.0 + (i % 3) * 0.1, base + i, base + i) for i in range(20)]
    rows1 += [("m.b.y", 5.0, base + i, base + i) for i in range(10)]
    spark.createDataFrame(rows1, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))

    query = None
    out_table = "ewma_out"
    stream = (
        spark.readStream.schema(LINE_SCHEMA).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    scored = ewma_anomalies(stream, alpha=0.3, z_threshold=3.0, min_n=5)
    query = (
        scored.writeStream.format("memory")
        .queryName(out_table)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()
        first = spark.sql(f"SELECT * FROM {out_table}").collect()
        assert len(first) == 30
        assert not any(r["is_anomaly"] for r in first), "steady signal must not alarm"

        # batch 2: a spike on m.a.x — state carried across micro-batches
        rows2 = [("m.a.x", 10.1, base + 100, base + 100), ("m.a.x", 500.0, base + 101, base + 101)]
        spark.createDataFrame(rows2, LINE_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()
        rows = spark.sql(
            f"SELECT * FROM {out_table} WHERE timestamp >= {base + 100} ORDER BY timestamp"
        ).collect()
        assert len(rows) == 2
        assert not rows[0]["is_anomaly"]
        assert rows[1]["is_anomaly"], "spike must alarm against carried state"
        assert rows[1]["ewma"] > 10.5  # state moved toward the spike
    finally:
        if query:
            query.stop()


@pytest.mark.slow
def test_sessionize_gap_and_timeout(spark, tmp_path):
    """Custom sessions: gap-close on a later event, timeout-flush via watermark."""
    from graphouse_spark.streaming.stateful import sessionize

    src = tmp_path / "sess_in"
    src.mkdir()
    base = 1_700_000_000
    schema = "key string, ts_sec long, value double"

    def write_batch(name, rows):
        # one file per batch: maxFilesPerTrigger=1 must see these rows
        # as ONE micro-batch, not one batch per shuffle partition file
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    # u1: two bursts separated by > gap (600) -> first session closes by gap
    write_batch("b1", [("u1", base, 1.0), ("u1", base + 30, 2.0),
                       ("u1", base + 1000, 5.0), ("u2", base, 7.0)])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withColumn("event_time", F.col("ts_sec").cast("timestamp"))
        .withWatermark("event_time", "10 seconds")
    )
    sessions = sessionize(stream, gap_seconds=600)
    query = (
        sessions.writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append").start()
    )
    try:
        query.processAllAvailable()
        rows = {(r["key"], r["session_start"]): r for r in spark.sql("SELECT * FROM sess_out").collect()}
        assert ("u1", base) in rows
        first = rows[("u1", base)]
        assert (first["session_end"], first["n_events"], first["sum_value"], first["closed_by"]) == (
            base + 30, 2, 3.0, "gap")

        # advance the watermark far past u1's open session and u2's only
        # session -> both flush by timeout
        write_batch("b2", [("u3", base + 10000, 1.0)])
        query.processAllAvailable()
        write_batch("b3", [("u3", base + 10001, 1.0)])  # extra batch so timeouts fire
        query.processAllAvailable()
        rows = {(r["key"], r["session_start"]): r for r in spark.sql("SELECT * FROM sess_out").collect()}
        assert rows[("u1", base + 1000)]["closed_by"] == "timeout"
        assert rows[("u1", base + 1000)]["n_events"] == 1
        u2 = rows[("u2", base)]
        assert (u2["n_events"], u2["sum_value"], u2["closed_by"]) == (1, 7.0, "timeout")
    finally:
        query.stop()


@pytest.mark.slow
def test_heavy_hitters_stream(spark, tmp_path):
    """Space-Saving top-k: state carries across batches, bounds hold."""
    from graphouse_spark.streaming.stateful import heavy_hitters

    src = tmp_path / "hh_in"
    src.mkdir()
    schema = "key string, item string"

    # batch 1: 'a' x5, 'b' x3, singles c..f; capacity 4 forces evictions
    b1 = [("k", "a")] * 5 + [("k", "b")] * 3 + [("k", x) for x in "cdef"]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src / "*"))
    hh = heavy_hitters(stream, capacity=4, top_k=3)
    query = (
        hh.writeStream.format("memory").queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "hh_ckpt"))
        .outputMode("append").start()
    )
    try:
        query.processAllAvailable()
        snap1 = spark.sql("SELECT * FROM hh_out WHERE batch_rank = 1").collect()
        assert snap1[0]["item"] == "a" and snap1[0]["est_count"] == 5

        # batch 2: 'b' surges; state (not batch-local counts) decides
        b2 = [("k", "b")] * 6
        spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))
        query.processAllAvailable()
        top = {r["batch_rank"]: r for r in spark.sql(
            "SELECT * FROM hh_out WHERE est_count >= 5 AND item = 'b'").collect()}
        best = max(top.values(), key=lambda r: r["est_count"])
        assert best["est_count"] == 9  # 3 + 6 carried across batches
        assert best["max_err"] == 0    # 'b' was never evicted
        # guarantee: est - err is a lower bound on true frequency
        for r in spark.sql("SELECT * FROM hh_out").collect():
            assert r["est_count"] - r["max_err"] >= 0
    finally:
        query.stop()


@pytest.mark.slow
def test_streaming_dedup_ttl(spark, tmp_path):
    """Exact-dedup manifest: first sight keeps, repeats suppress, TTL
    expiry reports the suppression count and re-opens the key."""
    from graphouse_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "dd_in"
    src.mkdir()
    base = 1_700_000_000
    schema = "content_key string, ts_sec long"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    # batch 1: A first + two repeats, B once
    write_batch("b1", [("A", base), ("A", base + 1), ("A", base + 2), ("B", base)])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withColumn("event_time", F.col("ts_sec").cast("timestamp"))
        .withWatermark("event_time", "5 seconds")
    )
    manifest = streaming_dedup(stream, ttl_seconds=600)
    query = (
        manifest.writeStream.format("memory").queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append").start()
    )
    try:
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM dd_out").collect()
        keeps = {r["content_key"]: r for r in rows if not r["expired"]}
        assert set(keeps) == {"A", "B"}
        assert keeps["A"]["first_ts"] == base and keeps["A"]["n_suppressed"] == 0

        # batch 2: another A repeat within TTL -> suppressed silently
        write_batch("b2", [("A", base + 10)])
        query.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM dd_out").collect()[0]["n"] == 2

        # advance the watermark past base + 600 -> both states expire and
        # report totals (A suppressed 3 repeats, B none)
        write_batch("b3", [("C", base + 2000)])
        query.processAllAvailable()
        write_batch("b4", [("C", base + 2001)])
        query.processAllAvailable()
        expired = {r["content_key"]: r for r in
                   spark.sql("SELECT * FROM dd_out WHERE expired").collect()}
        assert expired["A"]["n_suppressed"] == 3
        assert expired["B"]["n_suppressed"] == 0

        # A arrives again after expiry -> fresh keep row
        write_batch("b5", [("A", base + 2500)])
        query.processAllAvailable()
        a_rows = spark.sql(
            "SELECT * FROM dd_out WHERE content_key = 'A' AND NOT expired ORDER BY first_ts"
        ).collect()
        assert len(a_rows) == 2 and a_rows[1]["first_ts"] == base + 2500
    finally:
        query.stop()


@pytest.mark.slow
def test_streaming_funnel_state_across_batches(spark, tmp_path):
    from graphouse_spark.streaming.stateful import streaming_funnel

    src = tmp_path / "fin"
    src.mkdir()
    schema = "user_id long, ts_sec long, event_type string"

    def write(name, rows):
        # one file per batch: deterministic micro-batch contents
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    # batch 1: u1 view, u2 click only (no anchor -> no state advance)
    write("b1", [(1, 100, "view"), (1, 150, "other"), (2, 100, "click")])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = streaming_funnel(stream, ["view", "click", "purchase"], 3600)
    q = (
        out.writeStream.format("memory").queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "fckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        rows = {(r["user_id"], r["level"]) for r in spark.sql("SELECT * FROM funnel_out").collect()}
        assert rows == {(1, 1)}

        # batch 2: u1 click (advance vs carried state), u2 view (anchor)
        write("b2", [(1, 200, "click"), (2, 300, "view")])
        q.processAllAvailable()
        rows = {(r["user_id"], r["level"], r["advanced_at"])
                for r in spark.sql("SELECT * FROM funnel_out").collect()}
        assert rows == {(1, 1, 100), (1, 2, 200), (2, 1, 300)}

        # batch 3: u1 purchase OUTSIDE window -> no advance; u2 click inside
        write("b3", [(1, 100 + 3601, "purchase"), (2, 350, "click")])
        q.processAllAvailable()
        rows = {(r["user_id"], r["level"]) for r in spark.sql("SELECT * FROM funnel_out").collect()}
        assert rows == {(1, 1), (1, 2), (2, 1), (2, 2)}
    finally:
        q.stop()
