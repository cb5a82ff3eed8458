"""Batch-inference plumbing: Arrow kernel shape, stub determinism,
lazy per-worker model init contract."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.inference import (
    batch_score,
    make_model_scorer,
    perplexity_filter,
    stub_perplexity,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document body number {i} with some words") for i in range(50)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_score_deterministic_across_runs_and_partitioning(docs):
    a = {r["doc_id"]: r["score"] for r in batch_score(docs).collect()}
    b = {r["doc_id"]: r["score"] for r in batch_score(docs.repartition(7)).collect()}
    assert a == b  # content-hash scores ignore physical layout
    assert all(1.0 <= v < 101.0 for v in a.values())


def test_stub_matches_local_hash():
    import hashlib
    import pandas as pd

    t = "document body number 3 with some words"
    expect = 1.0 + (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 10000) / 100.0
    assert stub_perplexity(pd.Series([t]))[0] == expect


def test_perplexity_filter_threshold(docs):
    kept = perplexity_filter(docs, max_score=50.0)
    scores = {r["doc_id"]: r["score"] for r in batch_score(docs).collect()}
    expect = {i for i, s in scores.items() if s <= 50.0}
    assert {r["doc_id"] for r in kept.collect()} == expect
    assert 0 < len(expect) < 50  # threshold actually separates


def test_real_scorer_is_lazy_and_raises_without_runtime(docs):
    scorer = make_model_scorer("/models/quality-v1")
    # building the plan must not touch the model...
    df = batch_score(docs, scorer=scorer)
    # ...execution hits the per-worker init, which has no runtime here
    with pytest.raises(Exception, match="NotImplementedError|no ML runtime"):
        df.collect()


def test_embed_texts_shape_and_determinism(docs):
    from graphouse_spark.functions.inference import embed_texts

    a = {r["doc_id"]: r["embedding"] for r in embed_texts(docs, dim=8).collect()}
    b = {r["doc_id"]: r["embedding"] for r in embed_texts(docs.repartition(5), dim=8).collect()}
    assert a == b
    assert all(len(v) == 8 and all(-1.0 <= x < 1.0 for x in v) for v in a.values())


def test_embed_feeds_ann_operators(docs):
    from graphouse_spark.functions.inference import embed_texts
    from graphouse_spark.functions.similarity import cosine_topk

    emb = embed_texts(docs, dim=8).withColumnRenamed("doc_id", "vec_id")
    top = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    assert len(top) == 2 and all(r["query_id"] == 0 for r in top)
    assert top[0]["rank"] == 1 and top[0]["cosine"] >= top[1]["cosine"]


def test_word2vec_embedder_neighborhood_quality(spark):
    """The learned encoder must beat chance: train on a two-topic
    corpus (disjoint vocabularies, so co-occurrence fully determines
    topics) and require intra-topic document cosine to rank above
    inter-topic — pairwise AUC >= 0.9. The md5 stub stays the oracle
    twin for plumbing; this pins actual learned QUALITY."""
    import itertools

    import numpy as np

    from graphouse_spark.functions.inference import (
        embed_texts, train_word2vec_embedder)

    rng = np.random.default_rng(7)
    topic_a = ["spark", "shuffle", "executor", "partition", "catalyst",
               "parquet", "broadcast", "codegen"]
    topic_b = ["violin", "sonata", "orchestra", "tempo", "crescendo",
               "maestro", "aria", "cadenza"]
    docs = []
    for i in range(40):
        words = rng.choice(topic_a if i % 2 == 0 else topic_b, size=30)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    embedder, vocab = train_word2vec_embedder(df, dim=8, seed=1)
    assert vocab == len(topic_a) + len(topic_b)
    emb = {r["doc_id"]: np.array(r["embedding"])
           for r in embed_texts(df, dim=8, embedder=embedder).collect()}
    assert len(emb) == 40 and all(len(v) == 8 for v in emb.values())

    def cos(a, b):
        return float(np.dot(a, b))  # embeddings are L2-normalized

    intra, inter = [], []
    for i, j in itertools.combinations(range(40), 2):
        (intra if i % 2 == j % 2 else inter).append(cos(emb[i], emb[j]))
    wins = sum(a > b for a in intra for b in inter)
    auc = wins / (len(intra) * len(inter))
    assert auc >= 0.9, f"learned neighborhoods no better than chance: AUC={auc:.3f}"

    # determinism: same seed + single training partition -> same vectors
    embedder2, _ = train_word2vec_embedder(df, dim=8, seed=1)
    emb2 = {r["doc_id"]: r["embedding"]
            for r in embed_texts(df, dim=8, embedder=embedder2).collect()}
    assert emb2[0] == list(emb[0])

    # distributed fit (num_partitions>1, round-10 verdict #5): not
    # bit-identical to the 1-partition oracle twin (averaging order /
    # per-partition sampling differ) — the gate is QUALITY, the same
    # AUC bound the oracle mode carries
    embedder4, vocab4 = train_word2vec_embedder(
        df, dim=8, seed=1, num_partitions=4)
    assert vocab4 == vocab
    emb4 = {r["doc_id"]: np.array(r["embedding"])
            for r in embed_texts(df, dim=8, embedder=embedder4).collect()}
    wins4 = sum(cos(emb4[i], emb4[j]) > cos(emb4[a], emb4[b])
                for i, j in itertools.combinations(range(40), 2)
                if i % 2 == j % 2
                for a, b in itertools.combinations(range(40), 2)
                if a % 2 != b % 2)
    n_intra = len(intra) * len(inter)
    auc4 = wins4 / n_intra
    assert auc4 >= 0.9, f"distributed fit lost learned quality: AUC={auc4:.3f}"
    # NO bit-reproducibility assertion for the distributed mode: MLlib's
    # parallel fit is Hogwild-style — two identical (seed, input,
    # partitions) fits measurably differ. The docstring documents this;
    # bit-stable consumers must use num_partitions=1.
