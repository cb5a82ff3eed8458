"""Scale-up smoke: does the flagship path scale linearly past the test SF?

Builds a 10x copy of the sf0.1 events table in /tmp (id-offset unions —
same distributions, 10x rows ~ 6M events), then times the core
graphouse-shaped aggregations at 1x vs 10x. A healthy plan grows
roughly linearly (shuffle-bound), never quadratically, and keeps every
stage parallel (no 1-task stages).

Usage: python tools/scale_check.py [copies]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
import __spark_entry__ as em  # noqa: E402
from graphouse_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale10"


def build(spark, copies: int) -> None:
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    n = ev.count()
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * n))
        .withColumn("user_id", F.col("user_id") + F.lit(i * 1000))
        for i in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    # documents/embeddings too: the LLM-pipeline ops (dedup, ANN) are
    # the surfaces whose scale posture matters most. doc_id offsets
    # keep ids unique; texts/vectors repeat verbatim, so the near-dup
    # ops see a WORSE-than-real duplication profile — a conservative
    # stress (every doc gains copies-1 exact twins).
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    nd = docs.count()
    dparts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * nd))
        for i in range(copies)
    ]
    dbig = dparts[0]
    for p in dparts[1:]:
        dbig = dbig.unionByName(p)
    dbig.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    ne = emb.count()
    eparts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * ne))
        for i in range(copies)
    ]
    ebig = eparts[0]
    for p in eparts[1:]:
        ebig = ebig.unionByName(p)
    ebig.repartition(32).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, copies)

    # queries must read ONLY tables the build step scaled
    names = ["gh_lww_dedup", "gh_bucket_agg", "gh_two_level_agg",
             "gh_sliding_window", "gh_distinct_users", "gh_percentiles",
             "doc_exact_dedup", "doc_token_stats", "doc_chunk_dedup",
             "doc_minhash_np", "doc_duplicated_spans",
             "emb_cosine_topk_np", "emb_quantize",
             "doc_lm_perplexity", "emb_twostage_topk",
             "ev_weighted_quantiles", "doc_url_funcs",
             "ts_lttb", "ts_linreg_line", "ts_map_reduce",
             # round 4 replans: the window-min chain and the
             # sketch-only quantile read must stay shuffle-bound
             "ev_sequence_next", "sketch_value_quantiles",
             # round 5 replans: fingerprint-collapsed clustering and
             # the rank-percentile band join
             "doc_dedup_clusters", "doc_corpus_pipeline",
             "ts_remove_between_pctl"]
    qs = em.queries()
    print(f"{'query':24s} {'1x':>8s} {'x' + str(copies):>8s} {'ratio':>7s}")
    for name in names:
        fn = qs[name]
        fn(spark, BASE).count(); spark.catalog.clearCache()
        t0 = time.perf_counter(); fn(spark, BASE).count()
        t_small = time.perf_counter() - t0
        spark.catalog.clearCache()
        fn(spark, OUT).count(); spark.catalog.clearCache()
        t0 = time.perf_counter(); fn(spark, OUT).count()
        t_big = time.perf_counter() - t0
        print(f"{name:24s} {t_small:8.2f} {t_big:8.2f} {t_big / max(t_small, 1e-9):6.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
