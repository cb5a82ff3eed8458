"""Skew mitigation: salted two-phase aggregation.

AQE's skew-join splitting (enabled in the session) handles skewed
JOINS at runtime; skewed AGGREGATIONS on a hot key (one metric
receiving a large share of all points — common for rollup counters)
still funnel into one reducer. The classic fix is salting: spread the
hot key over N sub-keys, partially aggregate, then merge.

Only algebraic aggregates decompose this way; this module provides
the ones the engine uses (the retention family + count), composing
avg from (sum, count) across the two phases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str], value_col: str = "value",
                     function: str = "avg", n_salts: int = 16) -> DataFrame:
    """groupBy(keys).agg(function(value)) resistant to hot keys.

    Phase 1 groups by (keys..., salt) — the hot key spreads over
    ``n_salts`` reducers; phase 2 merges the partials. Output column
    is named ``value``.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    v = F.col(value_col)
    if function == "avg":
        partial = df.groupBy(*keys, salt).agg(
            F.sum(v).alias("_sum"), F.count(F.lit(1)).alias("_cnt")
        )
        return partial.groupBy(*keys).agg(
            (F.sum("_sum") / F.sum("_cnt")).alias("value")
        )
    if function in ("sum", "count"):
        agg1 = F.sum(v) if function == "sum" else F.count(F.lit(1))
        partial = df.groupBy(*keys, salt).agg(agg1.alias("_p"))
        return partial.groupBy(*keys).agg(F.sum("_p").alias("value"))
    if function in ("min", "max"):
        agg1 = F.min(v) if function == "min" else F.max(v)
        merge = F.min("_p") if function == "min" else F.max("_p")
        partial = df.groupBy(*keys, salt).agg(agg1.alias("_p"))
        return partial.groupBy(*keys).agg(merge.alias("value"))
    raise ValueError(f"function {function!r} does not decompose for salting")
