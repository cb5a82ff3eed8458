"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful stream logic is tree status propagation
(T6, handled driver-side); this module adds the kind of per-key
streaming state a metrics engine grows next: online EWMA + variance
per metric with anomaly flagging. It demonstrates the pattern SURVEY
§2.9 prescribes for distributed custom state — Arrow-batched groups,
explicit state schema, no watermark (late points update state in
arrival order, consistent with the engine's no-drop policy).

State per metric: (ewma, ewm_var, n). For each point:
    d = value - ewma ; ewma += alpha * d ; var = (1-alpha)*(var + alpha*d^2)
A point is anomalous when |d| > z * sqrt(var) once warmed up (n >= min_n).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("ewm_var", DoubleType()),
        StructField("n", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("timestamp", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)


def make_ewma_fn(alpha: float = 0.3, z_threshold: float = 3.0, min_n: int = 5):
    """Build the (key, batches, state) -> batches function (picklable)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            ewma, var, n = state.get
        else:
            ewma, var, n = 0.0, 0.0, 0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            for ts, value in zip(pdf["timestamp"], pdf["value"]):
                if n == 0:
                    ewma, var, d = float(value), 0.0, 0.0
                    is_anom = False
                else:
                    d = float(value) - ewma
                    # judge against the state BEFORE absorbing this point —
                    # otherwise a large spike inflates the variance it is
                    # tested against and masks itself
                    is_anom = bool(n > min_n and var > 0 and abs(d) > z_threshold * (var ** 0.5))
                    ewma += alpha * d
                    var = (1 - alpha) * (var + alpha * d * d)
                n += 1
                out_rows.append((name, int(ts), float(value), ewma, is_anom))
        state.update((ewma, var, n))
        yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return update


def ewma_anomalies(parsed: DataFrame, alpha: float = 0.3, z_threshold: float = 3.0,
                   min_n: int = 5) -> DataFrame:
    """Streaming DataFrame (name, timestamp, value, ...) -> scored stream.

    State is partitioned by metric name — the same key the storage
    layer clusters on, so a 100 TB stream shards its state evenly
    across executors along with the data.
    """
    return (
        parsed.groupBy("name")
        .applyInPandasWithState(
            make_ewma_fn(alpha, z_threshold, min_n),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
