"""File-level zonemap index: ClickHouse data-skipping for a parquet lake.

The reference's storage engine skips data two ways: the sparse primary
index over ``ORDER BY (metric, timestamp)`` (one mark per 8192 rows,
``doc/install.md:181-184``) and ``PARTITION BY`` month pruning. Spark
gives us partition pruning and parquet row-group statistics for free,
but row-group stats are only consulted AFTER a task has opened the
file — at 100 TB with millions of files, the scheduler still plans one
task per file split, and listing + footer reads dominate a selective
query.

This module restores the primary-index behavior: a tiny, persisted
**zonemap table** (one row per data file x column: min, max, nulls,
rows) built from parquet FOOTERS only — the analog of ``primary.idx``,
~bytes per gigabyte of data. A selective read first prunes the file
list against the zonemap (driver-side interval overlap on a table that
fits in memory even at millions of files), then hands Spark only the
surviving files. Because ``write_data`` sorts within partitions by
``(date, metric, timestamp)``, each file covers a narrow metric/ts
band and zones barely overlap — exactly why ClickHouse orders
MergeTree parts.

The zonemap is REBUILDABLE metadata, not a second source of truth:
``skipping_read`` re-applies the predicate after the scan, so a stale
index can only over-read (skip less), never return wrong rows — same
contract as CH skipping indexes (``may_be_true``, not ``is_true``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: columns of the persisted zonemap table
INDEX_SCHEMA = ("file string, column string, vmin string, vmax string, "
                "nulls long, rows long")


def _data_files(root: str, spark: SparkSession | None = None) -> list[str]:
    """Live data-file paths via the table's Hadoop FileSystem (one
    recursive listing RPC round, not a per-dir os.walk). The footer
    reads in ``_index_for_files`` use pyarrow on the executors and so
    currently assume executor-readable paths (local or a mounted
    view); the LISTING and every index read/write is FS-agnostic.

    Path style note (r12): listings return absolute/qualified paths
    where the old os.walk echoed the caller's root verbatim — an
    index built against a RELATIVE table path before r12 sees all its
    rows dropped as "dead" on the first update and re-footer-reads
    once (self-healing; prune correctness is never affected because
    unknown files are always kept).

    Manifest-committed tables (rename-less stores, r13) resolve
    through the table manifest: compacted partitions live in
    dot-hidden generation dirs a namespace listing would miss, and
    replaced-but-unswept root files would double-index."""
    from graphouse_spark import manifest as mf
    from graphouse_spark.fs import get_fs

    fs = get_fs(root, spark)
    if mf.manifest_mode(fs):
        resolved = mf.data_files_with_manifest(fs, root)
        if resolved is not None:
            return resolved
    return [p for p, _ in fs.list_files(root)]


def build_file_index(spark: SparkSession, table_path: str,
                     cols: list[str]) -> DataFrame:
    """Zonemap rows for every data file under ``table_path``.

    Footer-only reads, distributed: the FILE LIST (not the data) is
    parallelized so a million-file lake indexes with one short task per
    ~thousand footers. Min/max are stored as strings with a
    sortable encoding for numerics (zero-padded) so one schema serves
    every column type; :func:`prune_files` compares in the value domain.
    """
    return _index_for_files(spark, _data_files(table_path, spark), cols)


def _enc(v) -> str | None:
    """Order-preserving string encoding (zonemap stores one string type)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        return f"{v + 10**18:020d}"  # offset keeps negatives sortable
    if isinstance(v, float):
        import struct
        bits = struct.unpack(">Q", struct.pack(">d", v))[0]
        bits = bits ^ 0x8000000000000000 if v >= 0 else ~bits & 0xFFFFFFFFFFFFFFFF
        return f"{bits:020d}"
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v)


def write_file_index(index: DataFrame, index_path: str) -> None:
    index.repartition(1).write.mode("overwrite").parquet(index_path)


def read_file_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(index_path)


def prune_files(index: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose ``[vmin, vmax]`` zone may intersect ``[lo, hi]``.

    A file with NULL zone bounds (stats missing) is conservatively
    KEPT. Runs as one filter + distinct over the in-memory-sized
    zonemap; returns the surviving file list for the scan.
    """
    zone = index.filter(F.col("column") == col)
    keep = zone.filter(
        F.col("vmin").isNull()
        | ((F.col("vmax") >= F.lit(_enc(lo))) & (F.col("vmin") <= F.lit(_enc(hi))))
    )
    all_files = {r[0] for r in index.select("file").distinct().collect()}
    indexed = {r[0] for r in zone.select("file").distinct().collect()}
    kept = {r[0] for r in keep.select("file").distinct().collect()}
    # files the zonemap has no row for (new since build) are kept: the
    # index may only SKIP what it has proven out of range
    return sorted(kept | (all_files - indexed))


def skipping_read(spark: SparkSession, index: DataFrame, col: str, lo, hi,
                  base_path: str | None = None) -> DataFrame:
    """Scan only the files the zonemap cannot rule out, then re-apply
    the predicate (zones are may-contain, not must-contain).

    Pass ``base_path`` (the table root) when the lake is hive-partitioned
    so the partition directory columns survive a file-list read.
    """
    files = prune_files(index, col, lo, hi)
    if not files:
        # nothing can match; keep one file so the result has the table
        # schema — parquet row-group stats make the scan footer-only
        files = [index.select("file").first()[0]]
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    df = reader.parquet(*files)
    return df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))


def update_file_index(spark: SparkSession, table_path: str,
                      existing: DataFrame, cols: list[str]) -> DataFrame:
    """Incremental zonemap maintenance for an append-mostly lake.

    Footers are read ONLY for files the index has never seen (the
    per-batch ingest appends a handful of files; re-scanning a million
    old footers every batch would defeat the index). Rows for files
    that no longer exist (compaction/rollup rewrote the partition) are
    dropped — a zonemap row must never point at a dead file, and a
    freshly compacted file is simply "new" on the next update.
    """
    current = set(_data_files(table_path, spark))
    known = {r[0] for r in existing.select("file").distinct().collect()}
    kept = existing.filter(F.col("file").isin(list(current)) if current else F.lit(False))
    new_files = sorted(current - known)
    if not new_files:
        return kept
    fresh = _index_for_files(spark, new_files, cols)
    return kept.unionByName(fresh)


def _index_for_files(spark: SparkSession, files: list[str],
                     cols: list[str]) -> DataFrame:
    n_slices = max(1, min(len(files), spark.sparkContext.defaultParallelism))

    def footer_stats(paths):
        import pyarrow.parquet as pq

        for p in paths:
            md = pq.ParquetFile(p).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in cols:
                if c not in idx:
                    continue
                vmin = vmax = None
                nulls = 0
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        vmin = vmax = None
                        break
                    vmin = st.min if vmin is None else min(vmin, st.min)
                    vmax = st.max if vmax is None else max(vmax, st.max)
                    nulls += st.null_count or 0
                yield (p, c, _enc(vmin), _enc(vmax), nulls, md.num_rows)

    rdd = spark.sparkContext.parallelize(files, n_slices).mapPartitions(footer_stats)
    return spark.createDataFrame(rdd, INDEX_SCHEMA)


def prune_files_for_query(index: DataFrame, metric_names: list[str],
                          start: int, end: int,
                          metric_col: str = "metric",
                          ts_col: str = "timestamp") -> list[str]:
    """Survivors of the flagship /metricData predicate: ``metric IN
    (names) AND ts >= start AND ts < end`` — the zonemap twin of the
    reference's ``ORDER BY (metric, timestamp)`` primary-key seek
    (doc/install.md:181-184).

    One collect of the (tiny) zonemap, then pure driver-side interval
    math: a file survives when its metric zone contains ANY requested
    name (sorted-names + bisect, O(log n) per file) and its ts zone
    intersects ``[start, end)``. Files with missing zones/stats are
    conservatively kept — may-contain, never must-contain, so a stale
    index can only over-read.
    """
    import bisect

    rows = index.collect()
    names = sorted(metric_names)
    ts_lo, ts_hi = _enc(int(start)), _enc(int(end) - 1)  # half-open end
    all_files: set[str] = set()
    # file -> per-column verdict; missing column rows default to keep
    metric_ok: dict[str, bool] = {}
    ts_ok: dict[str, bool] = {}
    for r in rows:
        f = r["file"]
        all_files.add(f)
        vmin, vmax = r["vmin"], r["vmax"]
        if r["column"] == metric_col:
            if vmin is None or vmax is None:
                metric_ok[f] = True
            else:
                i = bisect.bisect_left(names, vmin)
                metric_ok[f] = i < len(names) and names[i] <= vmax
        elif r["column"] == ts_col:
            if vmin is None or vmax is None:
                ts_ok[f] = True
            else:
                ts_ok[f] = vmax >= ts_lo and vmin <= ts_hi
    return sorted(
        f for f in all_files
        if metric_ok.get(f, True) and ts_ok.get(f, True)
    )


def read_pruned_data(spark: SparkSession, data_path: str, index_path: str,
                     metric_names: list[str], start: int, end: int):
    """The flagship read path's index-assisted scan, or ``None``.

    Returns a DataFrame over ONLY the files :func:`prune_files_for_query`
    keeps (with ``basePath`` so hive partition columns survive), an
    empty-but-schema'd frame when the index proves nothing matches, or
    ``None`` when no usable index exists — the caller then falls back
    to the full-table read, so the index is purely an accelerator.
    """
    from graphouse_spark.fs import get_fs
    from graphouse_spark.schemas import DATA_SCHEMA

    if not index_path or not get_fs(index_path, spark).is_dir(index_path):
        return None
    try:
        index = read_file_index(spark, index_path)
        files = prune_files_for_query(index, metric_names, start, end)
        # bloom sidecar (built by maintenance alongside the zonemap):
        # membership-prunes the range survivors. Files the bloom has
        # never indexed stay — may-contain discipline throughout.
        bloom_path = index_path.rstrip("/") + "_bloom"
        if files and get_fs(bloom_path, spark).is_dir(bloom_path):
            blooms = read_bloom_index(spark, bloom_path)
            indexed = {r["file"] for r in blooms.select("file").distinct().collect()}
            may = set(prune_files_bloom(blooms, metric_names))
            files = [f for f in files if f not in indexed or f in may]
    except Exception:
        return None  # unreadable/corrupt index must never fail a read
    if not files:
        return spark.createDataFrame([], DATA_SCHEMA)
    return (
        spark.read.option("basePath", data_path)
        .schema(DATA_SCHEMA)
        .parquet(*files)
    )


def prune_files_multi(index: DataFrame, predicates: list[tuple]) -> list[str]:
    """Conjunctive pruning: files surviving EVERY (col, lo, hi) range.

    Each predicate can only shrink the survivor set (per-column zones
    are independent), so the intersection is still conservative —
    may-contain, never must-contain.
    """
    survivors: set[str] | None = None
    for col, lo, hi in predicates:
        s = set(prune_files(index, col, lo, hi))
        survivors = s if survivors is None else survivors & s
    return sorted(survivors or [])


# ---------------------------------------------------------------- bloom
# ClickHouse `bloom_filter` skip-index analog. The zonemap answers
# RANGE questions (metric between zone min/max); a file whose metric
# zone spans a wide lexicographic band still survives an IN-list probe
# for names it does not contain. The bloom sidecar answers the
# MEMBERSHIP question: one filter per file over its distinct metric
# names, so a scattered IN-list prunes to the files that may actually
# hold the requested series. Same contract as every skip structure
# here: may-contain, never must-contain — a stale/missing/corrupt
# bloom only over-reads.

BLOOM_SCHEMA = "file string, column string, n long, m long, k int, bits binary"


#: upper bound on probes per element: k = round(m/n * ln2) maxes out at
#: n=1 with the 64-bit floor (k = 44); 64 leaves headroom
_BLOOM_K_MAX = 64


def _bloom_digests(name: str, k: int) -> list[int]:
    """k INDEPENDENT portable hashes (md5 of ``name#i``).

    Not Kirsch-Mitzenmacher double hashing on purpose: with the
    filter sized to a byte boundary, ``(h1 + i*h2) mod m`` probes an
    arithmetic progression modulo ~2^b — two names whose strides
    collide mod m share most of their positions, and measured false
    positives ran ~1000x the target rate. Independent digests restore
    the textbook bound; md5 keeps every position engine-portable.
    """
    import hashlib

    return [
        int.from_bytes(hashlib.md5(f"{name}#{i}".encode("utf-8")).digest()[:8], "big")
        for i in range(k)
    ]


def build_bloom_index(spark: SparkSession, table_path: str,
                      col: str = "metric", fpp: float = 0.01) -> DataFrame:
    """One bloom filter per data file over its DISTINCT ``col`` values.

    Distributed like :func:`build_file_index`: the FILE LIST is
    parallelized; each task reads ONLY the indexed column (a
    dictionary-encoded parquet string column — a fraction of the file)
    and emits (n, m, k, bits). m/k are sized per file from its own
    distinct count at the requested false-positive rate, so small
    files carry small filters.
    """
    return _bloom_for_files(spark, _data_files(table_path, spark), col, fpp)


def update_bloom_index(spark: SparkSession, table_path: str,
                       existing: DataFrame, col: str = "metric",
                       fpp: float = 0.01) -> DataFrame:
    """Incremental bloom maintenance — same append-mostly contract as
    :func:`update_file_index`: only never-seen files are read, rows for
    dead files drop."""
    current = set(_data_files(table_path, spark))
    known = {r[0] for r in existing.select("file").distinct().collect()}
    kept = existing.filter(
        F.col("file").isin(list(current)) if current else F.lit(False))
    new_files = sorted(current - known)
    if not new_files:
        return kept
    return kept.unionByName(_bloom_for_files(spark, new_files, col, fpp))


def _bloom_for_files(spark: SparkSession, files: list[str],
                     col: str, fpp: float) -> DataFrame:
    import math as _math

    n_slices = max(1, min(len(files) or 1, spark.sparkContext.defaultParallelism))

    def blooms(paths):
        import numpy as np
        import pyarrow.parquet as pq

        for p in paths:
            try:
                tab = pq.read_table(p, columns=[col])
            except Exception:
                continue  # unreadable file -> no row -> caller keeps it
            uniq = {v for v in tab.column(0).to_pylist() if v is not None}
            n = max(1, len(uniq))
            m = max(64, int(_math.ceil(-n * _math.log(fpp) / (_math.log(2) ** 2))))
            m = (m + 7) // 8 * 8
            k = max(1, round(m / n * _math.log(2)))
            k = min(k, _BLOOM_K_MAX)
            bits = np.zeros(m // 8, dtype=np.uint8)
            for name in uniq:
                for d in _bloom_digests(name, k):
                    pos = d % m
                    bits[pos >> 3] |= 1 << (pos & 7)
            yield (p, col, n, m, k, bits.tobytes())

    rdd = spark.sparkContext.parallelize(files, n_slices).mapPartitions(blooms)
    return spark.createDataFrame(rdd, BLOOM_SCHEMA)


def write_bloom_index(index: DataFrame, index_path: str) -> None:
    index.coalesce(1).write.mode("overwrite").parquet(index_path)


def read_bloom_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.schema(BLOOM_SCHEMA).parquet(index_path)


def prune_files_bloom(bloom_index: DataFrame, names: list[str],
                      col: str = "metric") -> list[str]:
    """Files whose bloom may contain ANY of ``names``.

    The membership probe runs DISTRIBUTED over the index frame (one
    row per file) in an Arrow kernel — only surviving file paths reach
    the driver, so a million-file lake prunes without a driver-side
    bloom materialization. The (h1, h2) bases for the probe names are
    computed once here; each task folds them against its files' local
    (m, k, bits).
    """
    from pyspark.sql.functions import pandas_udf

    # digests precomputed ONCE here for the max probe count; each file
    # row uses its own k-prefix and modulus
    bases = [_bloom_digests(n, _BLOOM_K_MAX) for n in names]

    @pandas_udf("boolean")
    def may_contain(m_s: pd.Series, k_s: pd.Series,
                    bits_s: pd.Series) -> pd.Series:
        out = []
        for m, k, bits in zip(m_s, k_s, bits_s):
            if bits is None or m is None or m <= 0:
                out.append(True)  # unusable row: conservative keep
                continue
            # numpy int64 coerces a >63-bit python hash through float64
            # under %, silently corrupting positions — force python ints
            m, k = int(m), int(k)
            hit = False
            for digests in bases:
                if all(
                    bits[(d % m) >> 3] & (1 << ((d % m) & 7))
                    for d in digests[:k]
                ):
                    hit = True
                    break
            out.append(hit)
        return pd.Series(out)

    survivors = (
        bloom_index.filter(F.col("column") == col)
        .filter(may_contain(F.col("m"), F.col("k"), F.col("bits")))
        .select("file")
        .collect()
    )
    return sorted(r["file"] for r in survivors)
