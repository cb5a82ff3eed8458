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

    # batch 1: steady signal for two metrics
    rows1 = [("m.a.x", 10.0 + (i % 3) * 0.1, base + i, base + i) for i in range(20)]
    rows1 += [("m.b.y", 5.0, base + i, base + i) for i in range(10)]
    spark.createDataFrame(rows1, LINE_SCHEMA).write.parquet(str(src / "b1"))

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
        spark.createDataFrame(rows2, LINE_SCHEMA).write.parquet(str(src / "b2"))
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
