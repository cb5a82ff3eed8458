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
1:1. Each export lands in a fresh dot-hidden ``.gen-<ts>-<token>``
directory and becomes visible through ONE atomic manifest write (the
pointer-commit protocol of the fs.py design note — FileContext
OVERWRITE-rename locally/HDFS, a direct PUT on object stores), so a
crashed export never leaves a manifest pointing at partial data, a
re-export never breaks a concurrent reader (legacy flat readers
included — hidden dirs are invisible to Spark's listing), and the
sink works unchanged on rename-less stores (S3) where an in-place
directory overwrite cannot be made safe. Readers treat "no manifest"
as "no export"; superseded generations are garbage-collected after
the flip ({previous pointer target, grace window} protect in-flight
readers and racing writers).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphouse_spark.functions.packing import pack_sequences

MANIFEST = "_MANIFEST.json"


def write_training_shards(docs: DataFrame, out_dir: str, budget: int = 2048,
                          n_groups: int = 32, id_col: str = "doc_id",
                          text_col: str = "text",
                          gc_grace_seconds: int = 3600) -> dict:
    """Pack ``docs`` into token-budget shards and write them.

    Layout: ``out_dir/.gen-<ts>-<token>/group=<g>/*.parquet`` with rows
    (shard_id, offset, doc_id, n_tokens, text), sorted by
    (shard_id, offset) within files so a reader streams each shard's
    docs in pack order. Returns (and persists) the manifest:
    doc/token/shard counts, budget, packing utilization, and the
    generation the data lives in.

    GENERATION + POINTER COMMIT (the rename-less-store protocol from
    the fs.py design note, made concrete): each export writes into a
    fresh DOT-HIDDEN ``.gen-<ts>-<token>`` directory — never touching
    the live one, and invisible to Spark's own listing so a reader of
    a LEGACY flat export (pre-generation ``group=*`` dirs at the
    root) is never confused by a sibling generation dir appearing
    mid-scan. Visibility flips through ONE atomic manifest write
    (FileContext OVERWRITE-rename locally/HDFS — the pointer is never
    observably absent; a direct PUT on object stores). So:

    - a crash mid-export leaves the pointer on the previous
      generation: readers never see partial data, and a ``mode
      ("overwrite")`` into the live directory (the previous layout)
      can no longer break a concurrent reader mid-swap;
    - re-running after a crash simply writes a new generation;
    - garbage collection runs AFTER the pointer flip and keeps {the
      new generation, the generation the pointer pointed at BEFORE
      the flip, anything younger than a 1 h grace window}: an
      in-flight trainer holding the previous manifest still finds its
      files, crashed-orphan generations are cleaned once they age
      out, and a SLOWER CONCURRENT exporter's still-uncommitted
      generation is not swept out from under it (exports to one
      out_dir should still be serialized — the pointer is
      last-writer-wins — but racing ones no longer corrupt each
      other). Legacy flat data at the root is left for its own
      readers and can be removed manually once none remain.
    """
    import time
    import uuid

    from graphouse_spark.fs import get_fs

    # timestamp in the name drives the GC grace window; the uuid
    # suffix disambiguates same-second writers; the dot prefix hides
    # the dir from Spark listings of the root (legacy-reader safety)
    now = int(time.time())
    gen = f".gen-{now:012d}-{uuid.uuid4().hex[:8]}"
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
    # in-flight readers may hold — the only other one GC must keep.
    # A pointer that EXISTS but cannot be read/parsed (FS hiccup,
    # torn legacy write) must NOT degrade to prev_gen=None: that
    # would let the post-flip sweep delete the generation committed
    # just before the flip and strand its in-flight readers — skip
    # the GC sweep for this export instead (the next clean export
    # sweeps with a trustworthy prev_gen).
    prev_gen = None
    gc_safe = True
    if fs.exists(pointer):
        try:
            prev_gen = json.loads(fs.read_text(pointer)).get("generation")
        except Exception:
            gc_safe = False
    fs.write_text(pointer, json.dumps(manifest, sort_keys=True))
    # GC after the flip: generations other than {new, previously
    # committed} go once OLDER than the grace window — old enough
    # that they cannot be a concurrent exporter still mid-write,
    # young orphans age out on a later export
    for d in fs.listdir(out_dir.rstrip("/")) if gc_safe else []:
        if not d.startswith(".gen-") or d in (gen, prev_gen):
            continue
        try:
            ts = int(d.split("-")[1])
        except (ValueError, IndexError):
            # a foreign/renamed generation dir whose timestamp does
            # not parse gets LEFT ALONE (treating it as infinitely
            # old would bypass the grace window protecting a
            # concurrent writer) — same rule as write_tags' sweep
            continue
        if now - ts >= gc_grace_seconds:
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
