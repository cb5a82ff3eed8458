"""Multi-format document-corpus IO with corrupt-record hygiene.

Training-data pipelines rarely start from clean parquet: raw corpora
arrive as JSONL dumps or CSV exports with malformed lines mixed in.
These readers wrap Spark's native sources (full pushdown/pruning —
never a Python parse loop) in PERMISSIVE mode with an explicit
corrupt-record column, so every input line is accounted for: valid
rows flow to the pipeline, rejects flow to a quarantine frame with
the offending raw text. At 100 TB "skip bad lines silently" is a
data-loss bug; "fail the job on line 3 billion" is an outage — the
quarantine split is the only posture that scales.

The schema is enforced, not inferred: schema inference reads the data
twice and lets one malformed shard change column types under you.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical documents schema (matches the corpus parquet layout)
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   schema: T.StructType = DOCUMENTS_SCHEMA,
                   ) -> tuple[DataFrame, DataFrame]:
    """Read a document corpus; returns ``(docs, rejects)``.

    ``fmt``: ``parquet`` (schema-carrying; rejects is empty by
    construction), ``jsonl`` (one JSON object per line), or ``csv``
    (headered). For text formats every line lands in exactly one of
    the two frames: rows that parse against the enforced schema, or
    quarantine rows carrying the raw malformed line in ``raw``.

    Both frames are lazy views over ONE source relation — Spark scans
    the files once per action, and column pruning/pushdown still apply
    to the clean branch.
    """
    if fmt not in ("parquet", "jsonl", "csv"):
        raise ValueError(f"fmt must be parquet|jsonl|csv, got {fmt!r}")
    if fmt == "parquet":
        docs = spark.read.schema(schema).parquet(path)
        rejects = spark.createDataFrame([], "raw string")
        return docs, rejects
    # Text formats parse as text-scan + from_json/from_csv rather than
    # the json/csv DataSource: the source restriction
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids actions (count!) whose
    # pruned scan references only the corrupt column, and the
    # documented workaround is caching — wrong posture for a 100 TB
    # reject audit. A text scan has no such rule, the raw line is
    # naturally in hand for the quarantine frame, and the parse is
    # still a JVM-side Jackson/univocity expression inside codegen.
    wide = _with_corrupt(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    lines = spark.read.text(path).select(F.col("value").alias("raw"))
    if fmt == "jsonl":
        rec = F.from_json("raw", wide, opts)
    elif fmt == "csv":
        header = ",".join(f.name for f in schema.fields)
        lines = lines.filter(F.col("raw") != header)
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in wide.fields)
        rec = F.from_csv("raw", ddl, opts)
    else:
        raise ValueError(f"fmt must be parquet|jsonl|csv, got {fmt!r}")
    parsed = lines.select("raw", rec.alias("_rec"))
    docs = parsed.filter(F.col(f"_rec.{_CORRUPT}").isNull()).select(
        *[F.col(f"_rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    rejects = parsed.filter(F.col(f"_rec.{_CORRUPT}").isNotNull()).select("raw")
    return docs, rejects


def write_documents(docs: DataFrame, path: str, fmt: str = "parquet",
                    partition_by: tuple[str, ...] = ()) -> None:
    """Write a corpus partitioned for downstream pruning.

    ``partition_by=('lang',)`` (or source/date) turns per-language
    pipelines into partition-pruned scans — the documents analog of
    the metric table's date partitioning.
    """
    w = docs.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "jsonl":
        w.json(path)
    elif fmt == "csv":
        w.option("header", "true").csv(path)
    else:
        raise ValueError(f"fmt must be parquet|jsonl|csv, got {fmt!r}")


def stream_documents(spark: SparkSession, path: str,
                     schema: T.StructType = DOCUMENTS_SCHEMA,
                     ) -> tuple[DataFrame, DataFrame]:
    """Streaming JSONL corpus tail: the same parse/quarantine split as
    :func:`read_documents`, unbounded — files landing in ``path`` are
    ingested as they appear (the corpus-side analog of the graphite
    socket ingest: same hygiene contract, file-arrival instead of TCP).

    Returns streaming ``(docs, rejects)``. Drive with
    ``trigger(availableNow=True)`` for batch-style catch-up or a
    processing-time trigger for a live tail; both frames compose with
    the streaming dedup/rollup operators downstream.
    """
    wide = _with_corrupt(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    lines = spark.readStream.text(path).select(F.col("value").alias("raw"))
    parsed = lines.select("raw", F.from_json("raw", wide, opts).alias("_rec"))
    docs = parsed.filter(F.col(f"_rec.{_CORRUPT}").isNull()).select(
        *[F.col(f"_rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    rejects = parsed.filter(F.col(f"_rec.{_CORRUPT}").isNotNull()).select("raw")
    return docs, rejects
