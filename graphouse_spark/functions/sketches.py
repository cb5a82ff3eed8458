"""Mergeable sketch tables: store partial sketches, merge later.

At 100 TB the rollup problem is not computing a day's distinct count —
it is answering "distinct users last quarter" WITHOUT re-scanning a
quarter of raw events. The pattern (same as the reference's
AggregatingMergeTree-style rollups, re-expressed Spark-first) is a
sketch TABLE: one row per (group, day) holding a binary DataSketches
HLL sketch; any coarser window is an ``hll_union_agg`` over the stored
sketches — partial+final agg over kilobyte blobs, raw data untouched.

Union of sketches is exactly associative: merging daily sketches gives
the SAME estimate as sketching the raw week directly (tested), so the
rollup chain day -> week -> quarter never loses more accuracy than the
base sketch did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_sketch_table(events_sec: DataFrame, bucket_seconds: int = 86400,
                      lg_k: int = 12, ts_col: str = "ts_sec",
                      user_col: str = "user_id") -> DataFrame:
    """(bucket_ts, user_sketch, n_events): the stored daily partials."""
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_seconds).alias("bucket_ts")
    return events_sec.groupBy(bucket).agg(
        F.hll_sketch_agg(user_col, F.lit(lg_k)).alias("user_sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rollup_sketches(sketch_table: DataFrame, coarse_seconds: int,
                    bucket_col: str = "bucket_ts",
                    sketch_col: str = "user_sketch") -> DataFrame:
    """Merge stored fine sketches into coarser windows — no raw re-scan."""
    coarse = (F.col(bucket_col) - F.col(bucket_col) % coarse_seconds).alias("window_ts")
    return sketch_table.groupBy(coarse).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).cast("long").alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    )
