"""Training-shard export: the pipeline's last-mile SINK.

Everything upstream (dedup -> decontaminate -> quality gate -> sample
-> pack) produces a curated corpus; this module lands it on disk the
way a trainer wants to mount it: parquet shard files whose rows are
(shard_id, offset, doc) in deterministic order, plus a MANIFEST the
trainer (and the next pipeline run) can trust without re-scanning the
data.

Scale posture: the shard assignment comes from
``functions/packing.pack_sequences`` (partition-local FFD over
portable-hash groups — deterministic on any cluster layout); the join
back to the text is one broadcast-or-shuffle join on doc id; files are
written partitioned by pack group so a trainer maps groups to readers
1:1. The manifest is written AFTER the data with a tmp+rename swap, so
a crashed export never leaves a manifest pointing at partial data —
readers treat "no manifest" as "no export".
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.functions.packing import pack_sequences

MANIFEST = "_MANIFEST.json"


def write_training_shards(docs: DataFrame, out_dir: str, budget: int = 2048,
                          n_groups: int = 32, id_col: str = "doc_id",
                          text_col: str = "text") -> dict:
    """Pack ``docs`` into token-budget shards and write them.

    Layout: ``out_dir/group=<g>/*.parquet`` with rows
    (shard_id, offset, doc_id, n_tokens, text), sorted by
    (shard_id, offset) within files so a reader streams each shard's
    docs in pack order. Returns (and persists) the manifest:
    doc/token/shard counts, budget, and packing utilization.
    """
    packed = pack_sequences(docs, budget=budget, n_groups=n_groups,
                            id_col=id_col, text_col=text_col)
    joined = packed.join(docs.select(id_col, text_col), id_col)
    group = F.split(F.col("shard_id"), "-").getItem(0).cast("int").alias("group")
    out = joined.select(
        "shard_id", "offset", F.col(id_col).alias("doc_id"),
        "n_tokens", F.col(text_col).alias("text"), group,
    )
    (
        out.repartition("group")
        .sortWithinPartitions("shard_id", "offset")
        .write.mode("overwrite").partitionBy("group").parquet(out_dir)
    )
    # stats from the WRITTEN files, not the logical plan: re-running
    # the pack+join lineage would execute the whole pipeline twice,
    # and the manifest should describe what is actually on disk
    stats = docs.sparkSession.read.parquet(out_dir).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard_id").alias("shards"),
    ).first()
    manifest = {
        "docs": stats["docs"],
        "tokens": int(stats["tokens"] or 0),
        "shards": stats["shards"],
        "budget": budget,
        "n_groups": n_groups,
        "utilization": round(
            (stats["tokens"] or 0) / (max(stats["shards"], 1) * budget), 6),
    }
    # manifest pointer-commit through the lake's Hadoop FS (tmp-write
    # + rename; a crash leaves the manifest absent = uncommitted)
    from graphouse_spark.fs import get_fs

    get_fs(out_dir, docs.sparkSession).write_text(
        f"{out_dir.rstrip('/')}/{MANIFEST}",
        json.dumps(manifest, sort_keys=True))
    return manifest


def read_training_shards(spark: SparkSession, out_dir: str
                         ) -> tuple[DataFrame, dict]:
    """An exported corpus back as (frame, manifest). A missing manifest
    means the export never committed — refuse rather than serve
    possibly-partial data (the crash-safety contract of the writer)."""
    from graphouse_spark.fs import get_fs

    fs = get_fs(out_dir, spark)
    path = f"{out_dir.rstrip('/')}/{MANIFEST}"
    if not fs.exists(path):
        raise FileNotFoundError(
            f"no {MANIFEST} under {out_dir}: export absent or uncommitted")
    manifest = json.loads(fs.read_text(path))
    return spark.read.parquet(out_dir), manifest
