"""Rollup compaction at scale (round-8 verdict item #4): the
GraphiteMergeTree replacement (operators/rollup.compact_data_table)
proven beyond crash-safety —

- task-time scales linearly with rewritten bytes (1M -> 10M points);
- query results are invariant under compaction at the big size;
- under sustained micro-batch appends the compaction loop driven by
  ``compaction_candidates`` holds the table's file count at a bounded
  steady state (the small-file problem is the #1 real-world failure
  mode of streaming-parquet designs)."""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

from graphouse_spark.operators.rollup import compact_data_table
from graphouse_spark.plans.metricdata import MetricDataService
from graphouse_spark.queryparams import MetricDataQueryParams
from graphouse_spark.retention import (
    CombinedRetentionProvider, MetricRetention, MetricRetentionConfig)
from graphouse_spark.sources.tables import (
    compaction_candidates, read_data, table_stats, write_data)

sys.path.insert(0, "/root/repo/tools")

PROVIDER = CombinedRetentionProvider(
    [MetricRetentionConfig(".*", True,
                           MetricRetention("avg", {0: 60, 86400: 300}))])

BASE = 1_542_199_500  # 2018-11-14, 00:05 UTC-ish
NOW = BASE + 30 * 86400  # a month later: all four days are "old"
DAYS = 4
N_METRICS = 1000


def _build_points(spark, n_points: int, path: str) -> None:
    """n_points over N_METRICS metrics across DAYS old date
    partitions, 30 s cadence per metric (denser than the 60 s tier, so
    fresh->60 s would already shrink; the aged 300 s tier shrinks
    10x)."""
    # metric = id % N_METRICS; day = (id // N_METRICS) % DAYS (so every
    # size covers all DAYS partitions); within-day offset advances 30 s
    # per (metric, day) block — n/(N_METRICS*DAYS) points per metric-day
    # at 30 s cadence, 10x denser than the aged 300 s tier
    day = F.floor(F.col("id") / N_METRICS) % DAYS
    offset = (F.floor(F.col("id") / (N_METRICS * DAYS)) * 30) % 86400
    midnight = BASE - BASE % 86400  # day-aligned so offsets never spill
    pts = (
        spark.range(n_points)
        .select(
            F.concat(F.lit("one_min.h"),
                     (F.col("id") % (N_METRICS // 10)).cast("string"),
                     F.lit(".m"),
                     (F.floor(F.col("id") / (N_METRICS // 10)) % 10).cast("string")
                     ).alias("metric"),
            (F.col("id") % 1000).cast("double").alias("value"),
            (F.lit(midnight) + day * 86400 + offset).cast("long").alias("timestamp"),
            F.lit(1).cast("long").alias("updated"),
        )
    )
    write_data(pts, path, mode="overwrite")


def _query_sample(spark, path: str):
    service = MetricDataService(PROVIDER)
    names = [f"one_min.h{i}.m{j}" for i in range(3) for j in range(3)]
    params = MetricDataQueryParams.create(
        [PROVIDER.get_retention(n) for n in names],
        BASE, BASE + 2 * 86400, -1, now_seconds=NOW)
    return service.get_data(spark, read_data(spark, path), names,
                            BASE, BASE + 2 * 86400, params=params)


def _parquet_files(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        # live partitions only (dot-dirs are stage/backup)
        if "/.date=" in root or root.rsplit("/", 1)[-1].startswith("."):
            continue
        n += sum(f.endswith(".parquet") for f in files)
    return n


@pytest.mark.slow
def test_compaction_scales_linearly_and_preserves_queries(spark, tmp_path):
    from bench import _StageMeter

    meter = _StageMeter(spark)
    task_sec = {}
    sizes = {"small": 1_000_000, "big": 10_000_000}
    paths = {k: str(tmp_path / k) for k in sizes}
    for k, n in sizes.items():
        _build_points(spark, n, paths[k])

    before = _query_sample(spark, paths["big"])
    rows_before = {k: read_data(spark, paths[k]).count() for k in sizes}

    for k in sizes:
        snap = meter.max_stage_id()
        t0 = time.perf_counter()
        rewritten = compact_data_table(spark, paths[k], PROVIDER,
                                       now_seconds=NOW)
        wall = time.perf_counter() - t0
        task_sec[k] = meter.since(snap)["task_sec"]
        assert len(rewritten) == DAYS, rewritten
        print(f"compact {k}: wall={wall:.1f}s task={task_sec[k]:.1f}s")

    # 10x the input bytes -> at most ~linear task-time (scan + one
    # hash-aggregate + sorted write; generous 12x for scheduling slack
    # at the small end)
    growth = task_sec["big"] / max(task_sec["small"], 1e-9)
    assert growth <= 12.0, (
        f"compaction task-time grew {growth:.1f}x for 10x more data "
        f"({task_sec['small']:.1f}s -> {task_sec['big']:.1f}s)")

    # the rewrite actually compacted: 30 s cadence -> 300 s buckets
    for k in sizes:
        rows_after = read_data(spark, paths[k]).count()
        assert rows_after < rows_before[k] / 5, (k, rows_before[k],
                                                 rows_after)

    # query invariance at the big size (the GraphiteMergeTree core
    # property: rollup changes storage, never answers)
    after = _query_sample(spark, paths["big"])
    assert after == before


@pytest.mark.slow
def test_compaction_bounds_file_count_under_appends(spark, tmp_path):
    """Streaming steady state: micro-batch appends fragment the table;
    the candidates->compact loop returns it to a bounded file count,
    round after round."""
    path = str(tmp_path / "data")
    rounds, appends_per_round = 3, 10
    counts = []
    for rnd in range(rounds):
        for b in range(appends_per_round):
            # one micro-batch: 2k points for 200 metrics, one old day
            pts = (
                spark.range(2000)
                .select(
                    F.concat(F.lit("one_min.h"),
                             (F.col("id") % 200).cast("string"),
                             F.lit(".s")).alias("metric"),
                    F.col("id").cast("double").alias("value"),
                    (F.lit(BASE) + F.col("id") * 30
                     + rnd * 100_000 + b * 7).alias("timestamp"),
                    F.lit(rnd * appends_per_round + b)
                    .cast("long").alias("updated"),
                ))
            write_data(pts, path, target_partitions=4)
        frag = _parquet_files(path)
        # the candidates view flags the fragmented partition(s)
        cands = compaction_candidates(
            table_stats(spark, path), min_files=4).collect()
        assert cands, "fragmented table produced no compaction candidates"
        compact_data_table(spark, path, PROVIDER, now_seconds=NOW)
        compacted = _parquet_files(path)
        counts.append((frag, compacted))
        # steady state: every round ends under the bound, regardless
        # of how many append rounds came before
        assert compacted <= 3 * DAYS * 8, counts
    # and the compacted count is not drifting upward round over round
    assert counts[-1][1] <= counts[0][1] * 2, counts
    # post-compaction the small-file signal is clear
    left = compaction_candidates(
        table_stats(spark, path), min_files=4).collect()
    assert not left, left
