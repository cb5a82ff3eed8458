"""Train/eval contamination detection — the pre-training hygiene op.

Before training, every serious pipeline asks: which training documents
leak n-gram content of the held-out eval set? The standard detector
(GPT-3 appendix style) is n-gram overlap: a train doc is contaminated
if it shares >= ``min_shared`` distinct word n-grams with some eval
doc.

Spark-first shape:
- both sides reduce to (doc, ngram_hash) — the 60-bit portable md5 of
  each distinct word n-gram, so the shuffle carries 8-byte keys
  instead of raw n-gram strings (at 100 TB the hash-vs-string shuffle
  width is the difference between hours and days), and the whole
  pipeline stays DuckDB-oracle-checkable;
- the eval side is tiny compared to the train corpus (held-out sets
  are), so its hashed explode broadcasts; the train side streams
  through the join without a shuffle — cost is one scan of train;
- per-(train, eval) overlap counts aggregate once, then roll up per
  train doc.

Longer n-grams (default 8) make boilerplate collisions rare — the
hot-key blow-up that melts 2-gram joins does not exist at n=8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphouse_spark.functions.dedup import portable_hash60, word_shingles


def _hashed_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int,
                   tokens_col: str | None = None) -> DataFrame:
    """(id, gram-hash) rows, distinct per doc BY CONSTRUCTION:
    word_shingles array_distincts the grams before hashing, so no
    shuffle-backed distinct is needed afterwards — an explicit
    ``.distinct()`` here would re-shuffle the pipeline's largest
    intermediate (the exploded train-side grams) purely to remove
    rows that only exist if two distinct shingles of one doc collide
    in the 60-bit md5 prefix (~1e-12 per doc at realistic gram
    counts; the DuckDB oracle hashes the same family, so even then
    both engines see the same multiset).

    ``tokens_col``: a pre-tokenized array column to build grams from
    (pipeline fusion — callers that already materialized tokens skip
    the per-branch re-tokenize)."""
    from graphouse_spark.functions.dedup import word_shingles_from_tokens

    # md5-per-gram is CPU-bound: spread single-file corpora across
    # cores — but ONLY when the input is actually narrow (a fresh
    # single-file scan). An already-spread input (e.g. the corpus
    # pipeline's checkpointed survivor set) would pay a full shuffle
    # of the text+token columns for nothing.
    par = docs.sparkSession.sparkContext.defaultParallelism
    spread = docs if docs.rdd.getNumPartitions() >= par else docs.repartition(par)
    if tokens_col is not None:
        grams = word_shingles_from_tokens(F.col(tokens_col), n)
    else:
        grams = word_shingles(F.col(text_col), n)
    return spread.select(
        F.col(id_col),
        F.explode(F.transform(grams, portable_hash60)).alias("gram"),
    )


def ngram_contamination(train: DataFrame, eval_docs: DataFrame, n: int = 8,
                        min_shared: int = 2, id_col: str = "doc_id",
                        text_col: str = "text",
                        tokens_col: str | None = None) -> DataFrame:
    """Contaminated train docs: (train_id, n_eval_docs, max_shared).

    ``n_eval_docs`` counts eval documents sharing >= ``min_shared``
    distinct n-grams with the train doc; ``max_shared`` is the largest
    such overlap. Train docs with no qualifying overlap are absent —
    the output is the blocklist to subtract before training.

    ``tokens_col`` (optional): a pre-tokenized array column present on
    BOTH frames — skips the per-side re-tokenize when the caller
    already materialized tokens (corpus-pipeline fusion).
    """
    tr = _hashed_ngrams(train, id_col, text_col, n,
                        tokens_col).withColumnRenamed(id_col, "train_id")
    ev = _hashed_ngrams(eval_docs, id_col, text_col, n,
                        tokens_col).withColumnRenamed(id_col, "eval_id")
    overlaps = (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return overlaps.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_eval_docs"),
        F.max("n_shared").alias("max_shared"),
    )
