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
1:1. Each export lands in a fresh ``gen-<ts>-<token>`` directory and
becomes visible through ONE atomic manifest write (the pointer-commit
protocol of the fs.py design note — tmp+rename locally/HDFS, a direct
PUT on object stores), so a crashed export never leaves a manifest
pointing at partial data, a re-export never breaks a concurrent
reader, and the sink works unchanged on rename-less stores (S3) where
an in-place directory overwrite cannot be made safe. Readers treat
"no manifest" as "no export"; superseded generations are
garbage-collected after the flip (keep_generations protects in-flight
readers of the previous one).
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

    Layout: ``out_dir/gen-<token>/group=<g>/*.parquet`` with rows
    (shard_id, offset, doc_id, n_tokens, text), sorted by
    (shard_id, offset) within files so a reader streams each shard's
    docs in pack order. Returns (and persists) the manifest:
    doc/token/shard counts, budget, packing utilization, and the
    generation the data lives in.

    GENERATION + POINTER COMMIT (the rename-less-store protocol from
    the fs.py design note, made concrete): each export writes into a
    fresh ``gen-<token>`` directory — never touching the live one —
    and becomes visible through ONE atomic manifest write (tmp+rename
    locally/HDFS; a direct PUT on object stores). So:

    - a crash mid-export leaves the pointer on the previous
      generation: readers never see partial data, and a ``mode
      ("overwrite")`` into the live directory (the previous layout)
      can no longer break a concurrent reader mid-swap;
    - re-running after a crash simply writes a new generation;
    - garbage collection runs AFTER the pointer flip and keeps exactly
      {the new generation, the generation the pointer pointed at
      BEFORE the flip}: an in-flight trainer holding the previous
      manifest still finds its files, while crashed-orphan generations
      (written but never committed) are cleaned on the next export
      rather than accumulating.
    """
    import time
    import uuid

    from graphouse_spark.fs import get_fs

    # timestamp prefix makes generation names sort in creation order
    # (the GC keep-newest policy below relies on it); the uuid suffix
    # disambiguates same-second writers
    gen = f"gen-{int(time.time()):012d}-{uuid.uuid4().hex[:8]}"
    gen_dir = f"{out_dir.rstrip('/')}/{gen}"
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
        .write.mode("overwrite").partitionBy("group").parquet(gen_dir)
    )
    # stats from the WRITTEN files, not the logical plan: re-running
    # the pack+join lineage would execute the whole pipeline twice,
    # and the manifest should describe what is actually on disk
    stats = docs.sparkSession.read.parquet(gen_dir).agg(
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
        "generation": gen,
    }
    fs = get_fs(out_dir, docs.sparkSession)
    pointer = f"{out_dir.rstrip('/')}/{MANIFEST}"
    # the generation the pointer targets BEFORE the flip is the one
    # in-flight readers may hold — the only other one GC must keep
    prev_gen = None
    if fs.exists(pointer):
        try:
            prev_gen = json.loads(fs.read_text(pointer)).get("generation")
        except Exception:
            prev_gen = None
    fs.write_text(pointer, json.dumps(manifest, sort_keys=True))
    # GC after the flip: everything except {new, previously committed}
    # goes — including orphan generations a crashed export left behind
    for d in fs.listdir(out_dir.rstrip("/")):
        if d.startswith("gen-") and d not in (gen, prev_gen):
            fs.delete(f"{out_dir.rstrip('/')}/{d}")
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
    # resolve the committed generation (pre-generation manifests read
    # the root itself — the legacy flat layout)
    data_dir = out_dir
    if manifest.get("generation"):
        data_dir = f"{out_dir.rstrip('/')}/{manifest['generation']}"
    return spark.read.parquet(data_dir), manifest
