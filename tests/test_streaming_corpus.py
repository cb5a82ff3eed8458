"""Streaming training-corpus intake: scan-stage quality filtering +
TTL-state exact dedup composed over a document stream.

The batch operators (pii_stats expressions, token counts, hash keys)
are pure Column expressions, so the SAME code runs on a readStream
source unchanged — this test pins that property plus the composed
keep/suppress behavior across micro-batches.
"""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.pii import PII_PATTERNS
from graphouse_spark.streaming.stateful import streaming_dedup


@pytest.mark.slow
def test_streaming_quality_gate_plus_dedup(spark, tmp_path):
    src = tmp_path / "docs_in"
    src.mkdir()
    base = 1_700_000_000
    schema = "doc_id long, text string, ts_sec long"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / name))

    good = "plenty of ordinary words " * 4          # passes the gate
    pii = "mail me at a@b.io " + "filler words " * 6  # PII -> rejected
    short = "too short"                               # length -> rejected

    write_batch("b1", [(0, good, base), (1, pii, base + 1), (2, short, base + 2)])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .withColumn("event_time", F.col("ts_sec").cast("timestamp"))
        .withWatermark("event_time", "5 seconds")
    )
    # scan-stage quality gate: token count + zero PII hits (the same
    # Column expressions the batch operators use)
    n_pii = None
    for _, pattern, _repl in PII_PATTERNS:
        c = F.regexp_count(F.col("text"), F.lit(pattern))
        n_pii = c if n_pii is None else n_pii + c
    gated = stream.filter(
        (F.size(F.split(F.col("text"), r"\s+")) >= 10) & (n_pii == 0)
    )
    manifest = streaming_dedup(
        gated.withColumn("content_key", F.md5(F.col("text"))), ttl_seconds=600
    )
    query = (
        manifest.writeStream.format("memory").queryName("corpus_out")
        .option("checkpointLocation", str(tmp_path / "corpus_ckpt"))
        .outputMode("append").start()
    )
    try:
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM corpus_out").collect()
        # only the good doc survives the gate and registers one keep
        assert len(rows) == 1 and rows[0]["n_suppressed"] == 0

        # batch 2: an exact duplicate of the good doc -> suppressed by state
        write_batch("b2", [(3, good, base + 10)])
        query.processAllAvailable()
        assert spark.sql("SELECT count(*) AS n FROM corpus_out").collect()[0]["n"] == 1
    finally:
        query.stop()
