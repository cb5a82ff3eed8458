"""ClickHouse join strictness: ``ANY JOIN`` (at most one right row).

CH's ``ANY LEFT JOIN`` attaches an arbitrary single matching right row
per key; here the pick is DETERMINISTIC — the first by ``order_cols``
— because a training-data pipeline cannot accept engine-arbitrary
results (same determinization this repo applies to groupArraySample
and topK ties). ``ALL`` strictness is Spark's default join; ``SEMI`` /
``ANTI`` are native (``left_semi`` / ``left_anti``), so ANY is the
only missing member.

One bounded window rank on the right side (partition key = join key,
heap of 1), then a plain equi-join — the right side shrinks to unique
keys BEFORE the join shuffle, so a hot key cannot explode the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def any_join(left: DataFrame, right: DataFrame, on: "list[str] | str",
             order_cols: list, how: str = "left") -> DataFrame:
    """CH ``ANY <how> JOIN``: join with at most one right row per key,
    the first by ``order_cols`` (must be a total order for a
    deterministic result)."""
    keys = [on] if isinstance(on, str) else list(on)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    first = (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return left.join(first, keys, how)
