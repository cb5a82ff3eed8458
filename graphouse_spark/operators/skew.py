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


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join resistant to hot keys without relying on AQE.

    The big side gets a deterministic per-row salt (hash of all its
    columns, so retries and engines agree); the small side is exploded
    ``n_salts`` ways so every (key, salt) partition holds the matching
    small rows. A hot key thus spreads over ``n_salts`` reducers
    instead of melting one. Cost: small side replicated n_salts x —
    use for dimension-sized right sides when AQE's runtime skew split
    is unavailable (e.g. inside a cached/reused exchange, or a
    streaming micro-batch where AQE is off).

    Supports ``inner`` and ``left`` (left keeps unmatched big rows;
    the salt never drops rows because every salt value exists on the
    small side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner|left")
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")
