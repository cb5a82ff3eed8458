"""BASELINE §6 parity: sustain >= 10,000 points/s through parse + write.

The reference's load-generator default is 10k points/s; its design
ceiling is ~200k/s (1M-point batches, 5s flush). This smoke pushes
200k generated lines through the full parse/validate/layout-write path
and asserts the sustained rate beats the load-gen target with
comfortable margin on local[32].
"""

import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark.sources.graphite import parse_lines, to_data_rows
from graphouse_spark.sources.tables import read_data, write_data

N = 200_000
BASE = 1_542_199_500


@pytest.mark.slow
def test_parse_write_rate(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    lines = (
        spark.range(N)
        .repartition(par)
        .select(
            F.concat(
                F.lit("one_min.host"), (F.col("id") % 500).cast("string"),
                F.lit(".metric"), (F.col("id") % 37).cast("string"),
                F.lit(" "), (F.col("id") % 1000).cast("string"),
                F.lit(".5 "), (F.lit(BASE) + F.col("id") % 86400).cast("string"),
            ).alias("value")
        )
        .cache()
    )
    lines.count()  # generation excluded from the timed window

    parsed = parse_lines(lines, updated=F.lit(BASE))
    rows = to_data_rows(parsed)
    # steady-state measurement (same policy as bench.py): the first write
    # pays whole-stage-codegen compilation, which at 200k rows dwarfs the
    # actual pipeline; a long-lived ingest service compiles once
    write_data(rows, str(tmp_path / "warmup"))

    path = str(tmp_path / "data")
    t0 = time.perf_counter()
    write_data(rows, path)
    elapsed = time.perf_counter() - t0

    written = read_data(spark, path).count()
    assert written == N
    rate = written / elapsed
    print(f"\ningest rate: {rate:,.0f} points/s ({elapsed:.2f}s for {N:,})")
    assert rate >= 10_000, f"below the reference load-gen target: {rate:,.0f}/s"
