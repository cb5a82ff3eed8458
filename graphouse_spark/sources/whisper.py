"""Whisper (.wsp) migration source — read carbon's storage format.

The reference REPLACES carbon+whisper (doc/install.md:259: "You don't
need carbon or whisper, Graphouse and ClickHouse completely replace
them") — which means every adopter arrives with a directory tree of
.wsp files to migrate. This source reads them Spark-first: the
``binaryFile`` reader shards whole files across executors, a pure-byte
parser (the whisper format is just big-endian structs) runs per Arrow
batch, and the output is ingest-shaped ``(metric, timestamp, value)``
rows ready for ``streaming/ingest.ingest_batch``.

Format (whisper.py in graphite-project, stable since 2008):
- header: aggregationType u32, maxRetention u32, xFilesFactor f32,
  archiveCount u32
- per archive: offset u32, secondsPerPoint u32, points u32
- archive data at offset: ``points`` records of (interval u32, value
  f64), a ring buffer — interval 0 = empty slot.

Archive overlap: whisper keeps the same time range at several
resolutions. Migration keeps the FINEST archive's value where ranges
overlap (min secondsPerPoint per timestamp) — the same choice
whisper's own fetch makes when a range is servable by multiple
archives.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AGGREGATION = {1: "average", 2: "sum", 3: "last", 4: "max", 5: "min",
               6: "avg_zero", 7: "absmax", 8: "absmin"}


def parse_wsp(payload: bytes) -> dict:
    """Header + archives + raw points of one whisper file."""
    if len(payload) < 16:
        raise ValueError("truncated whisper header")
    agg, max_ret, xff, n_arch = struct.unpack_from(">LLfL", payload, 0)
    if agg not in AGGREGATION or n_arch == 0 or n_arch > 64:
        raise ValueError("not a whisper file (bad header)")
    archives = []
    for i in range(n_arch):
        off, spp, pts = struct.unpack_from(">LLL", payload, 16 + 12 * i)
        if off + 12 * pts > len(payload) or spp == 0:
            raise ValueError("truncated whisper archive")
        archives.append({"offset": off, "step": spp, "points": pts,
                         "retention": spp * pts})
    out = {
        "aggregation": AGGREGATION[agg],
        "max_retention": max_ret,
        "x_files_factor": xff,
        "archives": [],
    }
    for a in archives:
        vals = []
        for p in range(a["points"]):
            ts, v = struct.unpack_from(">Ld", payload, a["offset"] + 12 * p)
            if ts:  # 0 = never-written slot
                vals.append((ts, v))
        out["archives"].append({"step": a["step"],
                                "retention": a["retention"],
                                "points": vals})
    return out


def wsp_points(payload: bytes) -> list[tuple[int, float, int]]:
    """(timestamp, value, step) rows with the finest archive winning
    overlapping timestamps."""
    parsed = parse_wsp(payload)
    best: dict[int, tuple[float, int]] = {}
    for arch in sorted(parsed["archives"], key=lambda a: -a["step"]):
        # coarser first; finer archives overwrite on the same ts
        for ts, v in arch["points"]:
            best[ts] = (v, arch["step"])
    return [(ts, v, step) for ts, (v, step) in sorted(best.items())]


def _fs_path(p: str) -> str:
    """Scheme- and authority-free path: ``file:/a``, ``file:///a``,
    ``hdfs://nn:8020/a`` and plain ``/a`` all normalize to ``a``."""
    from urllib.parse import urlparse

    u = urlparse(p)
    return (u.path if u.scheme else p).lstrip("/")


def metric_name_of(path: str, root: str) -> str:
    """Whisper's dir layout IS the metric tree: strip the root prefix,
    drop .wsp, '/' -> '.' (carbon's path<->name rule). Both sides are
    normalized through urlparse so Hadoop's ``file:/...`` form, a
    ``file://`` URI and remote schemes like ``hdfs://`` all match —
    a silent prefix-miss would embed the storage root directories in
    every migrated metric name."""
    p = _fs_path(path)
    r = _fs_path(root).rstrip("/")
    if r:
        if p != r and not p.startswith(r + "/"):
            raise ValueError(
                f"whisper file {path!r} is not under root {root!r}")
        p = p[len(r):].lstrip("/")
    if p.endswith(".wsp"):
        p = p[:-4]
    return p.replace("/", ".")


def read_whisper(spark: SparkSession, root: str,
                 updated: int | None = None,
                 on_error: str = "fail") -> DataFrame:
    """Distributed whisper read: one row per migrated point —
    ``(name, timestamp, value, updated)``, the ingest row shape
    (``streaming/ingest.ingest_batch`` consumes it directly).

    ``binaryFile`` assigns whole .wsp files to tasks (a file is the
    atomic parse unit), so a million-file tree fans out across the
    cluster with no driver-side listing loop; parsing is per Arrow
    batch in ``mapInPandas``.

    ``on_error``:
    - ``"fail"`` (default): a corrupt file fails the task loudly —
      stop-the-migration semantics for curated trees.
    - ``"quarantine"``: the schema gains ``(error, path)`` columns; a
      corrupt .wsp yields ONE row with the exception text and file
      path (points columns null) instead of failing the job — a
      million-file migration should report its casualties, not die at
      file 999,731. Good rows carry ``error = NULL``; split with
      ``df.where("error IS NULL")``.
    """
    import pandas as pd

    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be fail|quarantine, got {on_error!r}")
    files = (spark.read.format("binaryFile")
             .option("recursiveFileLookup", "true")
             .option("pathGlobFilter", "*.wsp")
             .load(root))
    root_ = root
    quarantine = on_error == "quarantine"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    name = metric_name_of(str(path), root_)
                    for ts, v, _step in wsp_points(bytes(content)):
                        rows.append((name, ts, v, None, None))
                except Exception as exc:  # noqa: BLE001 - parse errors vary
                    if not quarantine:
                        raise
                    rows.append((None, None, None,
                                 f"{type(exc).__name__}: {exc}", str(path)))
            yield pd.DataFrame(rows, columns=["name", "timestamp", "value",
                                              "error", "path"])

    schema = ("name string, timestamp long, value double, "
              "error string, path string")
    out = files.select("path", "content").mapInPandas(run, schema)
    upd = F.lit(updated).cast("long") if updated is not None \
        else F.unix_timestamp()
    out = out.withColumn("updated", upd)
    if not quarantine:
        out = out.select("name", "timestamp", "value", "updated")
    return out


def build_wsp(archives: list[tuple[int, int]],
              points: dict[int, list[tuple[int, float]]],
              aggregation: int = 1, xff: float = 0.5) -> bytes:
    """Test twin: build a .wsp byte-for-byte. ``archives`` =
    [(seconds_per_point, n_points)]; ``points[i]`` = that archive's
    (timestamp, value) entries (ring slot = (ts // step) % n)."""
    n = len(archives)
    header_size = 16 + 12 * n
    out = bytearray()
    max_ret = max(s * p for s, p in archives)
    out += struct.pack(">LLfL", aggregation, max_ret, xff, n)
    off = header_size
    offsets = []
    for spp, pts in archives:
        out += struct.pack(">LLL", off, spp, pts)
        offsets.append(off)
        off += 12 * pts
    body = bytearray(b"\x00" * (off - header_size))
    for i, (spp, pts) in enumerate(archives):
        base = offsets[i] - header_size
        for ts, v in points.get(i, []):
            slot = (ts // spp) % pts
            struct.pack_into(">Ld", body, base + 12 * slot, ts, v)
    return bytes(out + body)
