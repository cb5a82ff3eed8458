"""As-of (nearest-timestamp) join — a time-series staple Spark lacks.

Not present in the reference (graphouse generates no join SQL beyond
the IN-list shapes, SURVEY §2.3); included as extended time-series
surface because every metrics store eventually needs "the last reading
at or before t".

The naive translation is a range join (``l.ts >= r.ts`` then pick the
max) — a cartesian blow-up per key that no optimizer saves at 100 TB.
The scalable shape is the union-merge: tag both sides, sort each key's
timeline once, and carry the latest right-side payload forward with
``last(ignorenulls)``. Cost = ONE shuffle of (left + right) on the
join key — the same price as a plain equi-join — regardless of how
many right rows precede each left row.

Ties: a right row at exactly the left timestamp matches (``<=``,
ASOF-standard). If the right side can hold several rows per
(key, timestamp), pre-aggregate it (e.g. ``max_by``) — the operator
asserts nothing about intra-timestamp order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_T = "_asof_t"
_PAYLOAD = "_asof_payload"


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_time: str, right_time: str,
              value_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance: int | None = None) -> DataFrame:
    """Left as-of join: attach the nearest right row per key.

    ``backward`` (default): latest right with ``right_time <=
    left_time``; ``forward``: earliest right with ``right_time >=
    left_time``. ``tolerance`` (same unit as the time columns) nulls
    out matches farther than the window. Right payload columns keep
    their names — pick non-colliding ``value_cols``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [c for c in right.columns if c not in keys + [right_time]]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    sign = 1 if direction == "backward" else -1

    r = right.select(
        *keys,
        (F.col(right_time) * sign).alias(_T),
        F.struct(*[F.col(c) for c in value_cols], F.col(right_time).alias(_T + "_orig")).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l = left.withColumn(_T, F.col(left_time) * sign).withColumn(_SIDE, F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at an equal timestamp -> "<=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_T).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        gap = F.col(_T) - F.col(_PAYLOAD)[_T + "_orig"] * sign  # >= 0 by construction
        out = out.withColumn(
            _PAYLOAD, F.when(gap <= tolerance, F.col(_PAYLOAD))
        )
    proj = [F.col(c) for c in left.columns]
    proj += [F.col(_PAYLOAD)[c].alias(c) for c in value_cols]
    return out.select(*proj)
