"""Graphite events store (ENGINE EXTENSION).

graphite-web keeps event markers (deploys, incidents, annotations) in
its own Django ORM table, exposed as ``POST /events`` + ``GET
/events/get_data`` and the ``events(*tags)`` render function
(graphite-web ``events/models.py``, ``render/functions.py:events``).
The reference (graphouse) has no analog — events never touch the
metric store — so this module is a documented extension mirroring the
graphite-web surface over a small date-partitioned parquet table:

- an event is ``(id, when, what, data, tags)``; ``tags`` is a list;
- ``get_data``/``events()`` filter by time window and by tags — ALL
  listed tags must be present (graphite chains one ``icontains``
  filter per tag, i.e. conjunctive);
- the render function yields one series named ``events(tag1, tag2)``
  with value 1.0 at each matching event's timestamp — the shape
  ``drawAsInfinite`` renders as vertical markers.

Scale posture: the events table is tiny by construction (human-scale
annotations, not metrics); every read prunes on the ``date``
partition column, and writes are driver-side single-row appends like
graphite's own ORM inserts.
"""

from __future__ import annotations

import json
import time
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType)

EVENTS_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("when", LongType()),
    StructField("what", StringType()),
    StructField("data", StringType()),
    StructField("tags", ArrayType(StringType())),
])


def write_events(spark: SparkSession, path: str, rows: Iterable[dict],
                 now_seconds: int | None = None) -> list[dict]:
    """Append events; returns the normalized rows (ids/when filled).

    Accepts graphite's POST shape: ``what`` required, ``when``
    defaulting to now, ``data`` optional, ``tags`` a list (a
    space-separated string is split, graphite's legacy spelling)."""
    now = int(time.time()) if now_seconds is None else now_seconds
    out: list[dict] = []
    for i, r in enumerate(rows):
        if not r.get("what"):
            raise ValueError("an event needs a 'what'")
        tags = r.get("tags") or []
        if isinstance(tags, str):
            tags = tags.split()
        when = int(r.get("when", now))
        import zlib

        sig = zlib.crc32(("%s|%s" % (r["what"], "|".join(tags))).encode())
        out.append({
            # collision-safe enough for an annotations table; stable
            # across replays of the same payload (crc32, not python's
            # per-process-salted hash)
            "id": (when * 1000003 + (sig & 0x7FFFF)) & 0x7FFFFFFFFFFFFFFF,
            "when": when,
            "what": str(r["what"]),
            "data": str(r.get("data", "")),
            "tags": [str(t) for t in tags],
        })
    if out:
        df = spark.createDataFrame(out, EVENTS_SCHEMA)
        (df.withColumn("date", F.to_date(F.from_unixtime(F.col("when"))))
         .repartition(1)
         .write.mode("append").partitionBy("date").parquet(path))
    return out


def read_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def filter_events(df: DataFrame, start: int | None, end: int | None,
                  tags: list[str] | None) -> DataFrame:
    """Window + conjunctive tag filter, with the ``date`` partition
    bounds derived from the window so the scan prunes."""
    if start is not None:
        df = df.filter((F.col("when") >= start) &
                       (F.col("date") >=
                        F.to_date(F.from_unixtime(F.lit(start)))))
    if end is not None:
        df = df.filter((F.col("when") <= end) &
                       (F.col("date") <=
                        F.to_date(F.from_unixtime(F.lit(end)))))
    for t in tags or []:
        df = df.filter(F.array_contains(F.col("tags"), t))
    return df


def events_series(df: DataFrame, tags: list[str],
                  start: int | None = None,
                  end: int | None = None) -> DataFrame:
    """The ``events(*tags)`` render series: 1.0 at each matching
    event's timestamp (graphite renders it through drawAsInfinite)."""
    name = "events(" + ", ".join(f'"{t}"' for t in tags) + ")" \
        if tags else "events"
    return (filter_events(df, start, end, tags)
            .select(F.lit(name).alias("metric"),
                    F.col("when").alias("ts"),
                    F.lit(1.0).alias("value")))


def events_json(df: DataFrame, start: int | None, end: int | None,
                tags: list[str] | None, limit: int = 10000) -> str:
    """``GET /events/get_data`` body: the graphite list-of-objects
    shape, oldest first."""
    rows = (filter_events(df, start, end, tags)
            .orderBy("when").limit(limit).collect())
    return json.dumps([
        {"id": r["id"], "what": r["what"], "when": r["when"],
         "tags": list(r["tags"]), "data": r["data"]}
        for r in rows
    ])
