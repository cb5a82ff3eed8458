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

#: entry cap for the per-task gram-hash memo (guide §5): bounds Python
#: worker RSS on high-cardinality splits; captured at plan-build time
#: so tests can shrink it.
_MEMO_CAP = 1 << 20



def _hashed_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int,
                   tokens_col: str | None = None,
                   strategy: str = "arrow") -> DataFrame:
    """(id, gram-hash) rows, distinct per doc BY CONSTRUCTION:
    the kernel set-dedups gram STRINGS before hashing (the engine twin
    array_distincts them), so no shuffle-backed distinct is needed
    afterwards — an explicit ``.distinct()`` here would re-shuffle the
    pipeline's largest intermediate (the exploded train-side grams)
    purely to remove rows that only exist if two distinct shingles of
    one doc collide in the 60-bit md5 prefix (~1e-12 per doc at
    realistic gram counts; the DuckDB oracle hashes the same family,
    so even then both engines see the same multiset).

    ``strategy='arrow'`` (default; same shape as
    ``minhash_signatures_np``): tokenize + shingle in Python and md5
    each **distinct** gram once per task (dict memo) — the engine form
    ran array_join(slice(...)) and md5 per position inside interpreted
    HOF lambdas, which never reach codegen.
    ``int.from_bytes(digest[:8]) >> 4`` equals
    ``conv(substring(md5(x),1,15),16,10)`` (first 15 hex chars), so
    the hash family — and every oracle — is bit-identical.
    ``strategy='engine'`` keeps the pure-Catalyst form (no Python
    workers); the equality test pins the two to the same rows.

    ``tokens_col``: a pre-tokenized array column to build grams from
    (pipeline fusion — callers that already materialized tokens skip
    the per-branch re-tokenize)."""
    import hashlib
    import re

    import pandas as pd

    # md5-per-gram is CPU-bound: spread single-file corpora across
    # cores — but ONLY when the input is actually narrow (a fresh
    # single-file scan). An already-spread input (e.g. the corpus
    # pipeline's checkpointed survivor set) would pay a full shuffle
    # of the text+token columns for nothing.
    par = docs.sparkSession.sparkContext.defaultParallelism
    spread = docs if docs.rdd.getNumPartitions() >= par else docs.repartition(par)
    if strategy == "engine":
        from graphouse_spark.functions.dedup import (
            portable_hash60,
            word_shingles,
            word_shingles_from_tokens,
        )

        if tokens_col is not None:
            grams = word_shingles_from_tokens(F.col(tokens_col), n)
        else:
            grams = word_shingles(F.col(text_col), n)
        return spread.select(
            F.col(id_col),
            F.explode(F.transform(grams, portable_hash60)).alias("gram"),
        )
    if strategy != "arrow":
        raise ValueError(f"strategy must be arrow|engine, got {strategy!r}")
    id_type = docs.schema[id_col].dataType.simpleString()
    src = tokens_col if tokens_col is not None else text_col
    # ASCII \s: Java regex \s (the Catalyst twin) and RE2 (the DuckDB
    # oracle) are ASCII-only; Python's default \s also eats Unicode
    # whitespace, which would silently fork the token stream
    ws = re.compile(r"\s+", re.ASCII)
    pre_tokenized = tokens_col is not None

    # captured here (driver-side) so a monkeypatched _MEMO_CAP reaches
    # the pickled kernel closure
    _CAP = _MEMO_CAP

    def kernel(batches):
        # Bounded per-task memo (guide §5): the within-batch/doc
        # repetition carries the win; an unbounded dict over every
        # distinct gram in a 128 MB split of documents can reach GBs
        # of Python-worker RSS at corpus scale.
        hcache: dict = {}
        _md5 = hashlib.md5
        for pdf in batches:
            out_ids: list = []
            out_hashes: list = []
            for doc_id, val in zip(pdf[id_col], pdf[src]):
                if pre_tokenized:
                    if val is None:
                        # engine twin: NULL tokens -> greatest(NULL,1)
                        # routes to ONE all-NULL gram, which explodes
                        # to a single (id, NULL) row (inner equi-join
                        # drops it later, but the operator-level rows
                        # must match)
                        out_ids.append(doc_id)
                        out_hashes.append(None)
                        continue
                    toks = val
                else:
                    if val is None or (not isinstance(val, str) and pd.isna(val)):
                        out_ids.append(doc_id)
                        out_hashes.append(None)
                        continue
                    toks = [t for t in ws.split(str(val).lower()) if t]
                if len(toks) <= n - 1:
                    # engine twin: k <= 0 branch emits ONE gram — the
                    # whole (possibly empty) token list joined
                    grams = {" ".join(toks)}
                else:
                    grams = {
                        " ".join(toks[j:j + n])
                        for j in range(len(toks) - n + 1)
                    }
                for g in grams:
                    h = hcache.get(g)
                    if h is None:
                        if len(hcache) >= _CAP:
                            hcache.clear()
                        h = hcache[g] = int.from_bytes(
                            _md5(g.encode("utf-8")).digest()[:8], "big") >> 4
                    out_ids.append(doc_id)
                    out_hashes.append(h)
            # nullable Int64, never inferred float64: a NULL-doc row in
            # the batch would otherwise make pandas infer float64 for
            # the whole gram column, silently rounding 60-bit hashes
            # past float64's 53-bit mantissa (same guard as simhash_np)
            yield pd.DataFrame(
                {id_col: out_ids,
                 "gram": pd.array(out_hashes, dtype="Int64")})

    return spread.select(id_col, src).mapInPandas(
        kernel, f"{id_col} {id_type}, gram long"
    )


def ngram_contamination(train: DataFrame, eval_docs: DataFrame, n: int = 8,
                        min_shared: int = 2, id_col: str = "doc_id",
                        text_col: str = "text",
                        tokens_col: str | None = None,
                        strategy: str = "arrow") -> DataFrame:
    """Contaminated train docs: (train_id, n_eval_docs, max_shared).

    ``n_eval_docs`` counts eval documents sharing >= ``min_shared``
    distinct n-grams with the train doc; ``max_shared`` is the largest
    such overlap. Train docs with no qualifying overlap are absent —
    the output is the blocklist to subtract before training.

    ``tokens_col`` (optional): a pre-tokenized array column present on
    BOTH frames — skips the per-side re-tokenize when the caller
    already materialized tokens (corpus-pipeline fusion).
    """
    tr = _hashed_ngrams(train, id_col, text_col, n, tokens_col,
                        strategy).withColumnRenamed(id_col, "train_id")
    ev = _hashed_ngrams(eval_docs, id_col, text_col, n, tokens_col,
                        strategy).withColumnRenamed(id_col, "eval_id")
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
