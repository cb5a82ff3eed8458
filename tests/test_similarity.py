"""ANN paths: IVF and LSH against the brute-force exact baseline."""

import pytest
from pyspark.sql import functions as F

from graphouse_spark.functions.similarity import cosine_topk, ivf_index, ivf_topk, lsh_cosine_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def pairs(rows):
    return {(r["query_id"], r["neighbor_id"]) for r in rows}


def test_ivf_recall_and_exactness(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = pairs(cosine_topk(emb, queries, k=3).collect())
    assigned, centroids = ivf_index(emb, n_clusters=8, iters=2)
    assigned = assigned.cache()
    # balanced-ish cells: no cell swallows the corpus
    sizes = [r["count"] for r in assigned.groupBy("cluster").count().collect()]
    assert len(sizes) == 8 and max(sizes) < emb.count() / 2
    # half the probes already recovers most of the exact set
    approx = pairs(ivf_topk(assigned, centroids, queries, k=3, nprobe=4).collect())
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall {recall}"
    # probing every cell degenerates to exact brute force
    full = pairs(ivf_topk(assigned, centroids, queries, k=3, nprobe=8).collect())
    assert full == exact


def test_lsh_subset_of_scores(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = lsh_cosine_topk(emb, queries, dim=64, k=3, n_planes=6).collect()
    # every returned neighbor must carry the true cosine (verified by
    # rank monotonicity within each query)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rows in by_q.items():
        rows.sort()
        cosines = [c for _, c in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_vectorized_topk_matches_jvm_strategy(spark):
    """Two physical strategies, one logical op: the Arrow/numpy matmul
    path must return byte-identical rows to the zip_with fold path."""
    from pyspark.sql import functions as F

    from graphouse_spark.functions.similarity import cosine_topk, cosine_topk_vectorized

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    a = sorted(map(tuple, cosine_topk(emb, queries, k=5).collect()))
    b = sorted(map(tuple, cosine_topk_vectorized(emb, queries, k=5).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pq_corpus(spark):
    """Structured synthetic embeddings: 4 well-separated cluster centers
    in 8-D plus small deterministic offsets — PQ must preserve cluster
    neighborhoods."""
    import itertools

    centers = [
        [5.0, 0, 0, 0, 5.0, 0, 0, 0],
        [0, 5.0, 0, 0, 0, 5.0, 0, 0],
        [0, 0, 5.0, 0, 0, 0, 5.0, 0],
        [0, 0, 0, 5.0, 0, 0, 0, 5.0],
    ]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        off = [((i * 7 + j * 3) % 10 - 5) / 10.0 for j in range(8)]
        rows.append((i, [c[j] + off[j] for j in range(8)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_train_encode_shapes_and_determinism(pq_corpus):
    from graphouse_spark.functions.similarity import pq_encode, pq_train

    cb = pq_train(pq_corpus, m=4, k=8, iters=4, sample_rows=128)
    assert len(cb) == 4 and all(len(c) == 8 and len(c[0]) == 2 for c in cb)
    a = {r["vec_id"]: r["codes"] for r in pq_encode(pq_corpus, cb).collect()}
    b = {r["vec_id"]: r["codes"]
         for r in pq_encode(pq_corpus.repartition(5), cb).collect()}
    assert a == b  # layout-independent
    assert all(0 <= code < 8 for codes in a.values() for code in codes)


def test_pq_adc_recall_against_exact(pq_corpus):
    from graphouse_spark.functions.similarity import (
        cosine_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    cb = pq_train(pq_corpus, m=4, k=16, iters=4, sample_rows=200)
    codes = pq_encode(pq_corpus, cb)
    queries = pq_corpus.filter("vec_id < 3")
    approx = pq_adc_topk(codes, cb, queries, k=10)
    exact = cosine_topk(pq_corpus, queries, k=10)
    for qid in range(3):
        a = {r["neighbor_id"] for r in approx.collect() if r["query_id"] == qid}
        e = {r["neighbor_id"] for r in exact.collect() if r["query_id"] == qid}
        # cluster structure must survive 8->1 float compression
        assert len(a & e) >= 6, f"recall@10 too low for query {qid}: {len(a & e)}"


def test_pq_rejects_indivisible_dim(pq_corpus):
    from graphouse_spark.functions.similarity import pq_train

    with pytest.raises(ValueError):
        pq_train(pq_corpus, m=3)


def test_ivfpq_recall_and_pruning(pq_corpus):
    """IVF-PQ composite: residual quantization preserves cluster
    neighborhoods; probing all cells ~= probing the right cells."""
    from graphouse_spark.functions.similarity import (
        cosine_topk,
        ivfpq_build,
        ivfpq_topk,
    )

    coded, cents, cbs = ivfpq_build(pq_corpus, n_clusters=4, m=4, k=16,
                                    kmeans_iters=2, sample_rows=200)
    assert set(coded.columns) == {"vec_id", "codes", "cluster"}
    queries = pq_corpus.filter("vec_id < 3")
    approx = ivfpq_topk(coded, cents, cbs, queries, k=10, nprobe=2)
    exact = cosine_topk(pq_corpus, queries, k=10)
    arows = approx.collect()
    for qid in range(3):
        a = {r["neighbor_id"] for r in arows if r["query_id"] == qid}
        e = {r["neighbor_id"] for r in exact.collect() if r["query_id"] == qid}
        assert len(a & e) >= 6, f"ivfpq recall@10 too low for {qid}: {len(a & e)}"
    # determinism across physical layout
    brows = ivfpq_topk(coded.repartition(5), cents, cbs, queries, k=10, nprobe=2).collect()
    assert sorted(map(tuple, arows)) == sorted(map(tuple, brows))


def test_knn_graph_mutual_edges(spark):
    from graphouse_spark.functions.similarity import knn_graph

    # two tight pairs + one outlier; k=1 -> exactly the two pairs
    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.99, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.99, 0.1]),
        (5, [-1.0, -1.0, 5.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted((r["src"], r["dst"]) for r in knn_graph(emb, k=1).collect())
    assert got == [(1, 2), (3, 4)]
    directed = knn_graph(emb, k=1, mutual=False)
    assert directed.count() == 5  # every vector has a top-1


def test_semdedup_drops_planted_duplicates(spark):
    from graphouse_spark.functions.similarity import semdedup

    # 30 well-spread vectors + 3 near-copies of vector 0
    import math
    base = [(i, [math.cos(i), math.sin(i), float(i % 5)]) for i in range(30)]
    dupes = [(100 + j, [math.cos(0) + 1e-4 * j, math.sin(0), 0.0]) for j in range(3)]
    emb = spark.createDataFrame(base + dupes, "vec_id long, embedding array<double>")
    out = semdedup(emb, n_clusters=4, threshold=0.999)
    kept = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # the copies score ~1.0 against vector 0 (lowest id in their cluster)
    assert 0 in kept
    assert not {100, 101, 102} & kept.keys()

    # THE invariant: no surviving same-cluster pair still scores >= tau
    def cos(u, v):
        import math as m
        d = sum(a * b for a, b in zip(u, v))
        return d / (m.sqrt(sum(a * a for a in u)) * m.sqrt(sum(a * a for a in v)))

    vecs = dict(base + dupes)
    ids = sorted(kept)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if kept[a] == kept[b]:
                assert cos(vecs[a], vecs[b]) < 0.999


def test_semdedup_deterministic_across_partitioning(spark):
    from graphouse_spark.functions.similarity import semdedup

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17 + 1).cast("double") for i in range(4)]).alias("embedding"),
    )
    a = sorted(r["vec_id"] for r in semdedup(emb, n_clusters=4, threshold=0.98).collect())
    b = sorted(r["vec_id"] for r in semdedup(emb.repartition(13), n_clusters=4, threshold=0.98).collect())
    assert a == b


def test_two_stage_topk(spark, emb):
    from graphouse_spark.functions.similarity import two_stage_topk

    queries = emb.filter(F.col("vec_id") < 5)
    exact = pairs(cosine_topk(emb, queries, k=3).collect())
    n = emb.count()
    # shortlist covering the whole corpus degenerates to exact search
    full = two_stage_topk(emb, queries, k=3, coarse_dims=16, shortlist=n)
    assert pairs(full.collect()) == exact
    # exact cosines survive the re-rank unchanged
    ec = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in cosine_topk(emb, queries, k=3).collect()}
    fc = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in full.collect()}
    assert ec == fc
    # recall is monotone in shortlist size (a superset shortlist can
    # only add exact members to the re-rank pool). Absolute recall on
    # THIS corpus is weak by construction: the synthetic embeddings
    # are i.i.d. random, so the 16-dim prefix is maximally
    # uninformative about the full-64 cosine — the worst case for
    # prefix truncation; real Matryoshka-trained embeddings front-load
    # the signal.
    r = {}
    for sl in (10, 100):
        approx = pairs(
            two_stage_topk(emb, queries, k=3, coarse_dims=16, shortlist=sl).collect()
        )
        r[sl] = len(exact & approx) / len(exact)
    assert r[10] <= r[100]
    assert r[100] >= 0.5, f"recall {r}"
