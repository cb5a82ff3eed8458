"""Interval (range) join — all right rows within a time window of each
left row, per key.

Extended time-series surface (the reference's only joins are IN-list
shapes, SURVEY §2.3). Spark executes a raw non-equi predicate like
``r.t BETWEEN l.t - b AND l.t + a`` as a broadcast-nested-loop or a
cartesian-per-key sort-merge — quadratic in the hot keys and hopeless
at 100 TB.

Scalable shape: quantize time into buckets of width ``before +
after``, replicate each LEFT row into the (at most 3) buckets its
window can touch, then a plain equi-join on (key, bucket) + exact
range filter. Shuffle volume is ``|L| * ~2-3 + |R|`` — linear, and the
join itself is a hash join Catalyst/AQE can optimize like any other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "_iv_bucket"


def interval_join(left: DataFrame, right: DataFrame, on: list[str] | str,
                  left_time: str, right_time: str,
                  before: int = 0, after: int = 0,
                  value_cols: list[str] | None = None) -> DataFrame:
    """Inner join: right rows with ``l.t - before <= r.t <= l.t + after``.

    Returns every (left row, right row) match; right payload columns
    keep their names (pick non-colliding ``value_cols``). ``before``/
    ``after`` are in the time columns' own unit.
    """
    if before < 0 or after < 0 or before + after <= 0:
        raise ValueError("need before >= 0, after >= 0, before + after > 0")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in keys + [right_time]]
    width = before + after

    r = right.select(
        *keys,
        F.col(right_time).alias("_iv_rt"),
        F.floor(F.col(right_time) / width).cast("long").alias(_B),
        *[F.col(c) for c in value_cols],
    )
    # floor (not trunc-toward-zero) keeps negative timestamps in the right bucket
    lo = F.floor((F.col(left_time) - before) / width).cast("long")
    hi = F.floor((F.col(left_time) + after) / width).cast("long")
    l = left.withColumn(_B, F.explode(F.sequence(lo, hi)))
    matched = (
        l.join(r, keys + [_B])
        .filter(F.col("_iv_rt").between(F.col(left_time) - before, F.col(left_time) + after))
    )
    return matched.select(*[F.col(c) for c in left.columns], *[F.col(c) for c in value_cols],
                          F.col("_iv_rt").alias(right_time + "_matched"))
