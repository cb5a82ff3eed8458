"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus; dot products via ``zip_with`` +
  ``aggregate`` stay JVM-side. This is the correctness baseline and
  the right plan whenever |queries| is small — the corpus is scanned
  once regardless of its size.
- :func:`lsh_cosine_buckets` / :func:`lsh_cosine_topk` — the scale
  path: random-hyperplane LSH. Each vector gets a sign-bit bucket key;
  only same-bucket pairs are scored. Planes are generated driver-side
  from a fixed seed (deterministic), shipped as literals — no state,
  no fitted model, works in one pass at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine of two array<float/double> columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def quantize_embeddings(embeddings: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization.

    ``scale = 127 / max(|x|)``; ``code_i = round(x_i * scale)`` — 4x
    smaller than float32 (the standard first step before shipping an
    ANN corpus to a serving tier). Pure Column expressions, one
    projection, no shuffle; at 100 TB this runs entirely inside the
    scan stage. Zero vectors get scale 1.0 (all-zero codes).

    Returns (id, scale, codes: array<int>); reverse with
    ``code / scale``.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(vec, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(1.0))
    codes = F.transform(vec, lambda x: F.round(x * scale).cast("int"))
    return embeddings.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        codes.alias("codes"),
    )


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    ``queries``: (id, vec) — small; broadcast-joined against the corpus.
    Returns (query_id, neighbor_id, cosine) with deterministic
    (cosine desc, neighbor_id) ranking, self-matches excluded.

    The double-cast and norm of BOTH sides are hoisted to per-row
    projections before the join, so the per-pair work is a single
    dot product. Higher-order-function lambdas are interpreted (never
    codegen) and see no common-subexpression elimination, so the
    naive per-pair ``cosine_similarity_col`` costs ~5 interpreted
    array passes per pair; hoisting makes it 1 — same floats, same
    ``dot/(|a||b|)`` arithmetic, ~5x less per-pair work. At 100 TB
    the hoisted norms also shrink with the corpus scan, not the pair
    count.
    """
    qd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    q = queries.select(
        F.col(id_col).alias("query_id"), qd.alias("_qvec")
    ).withColumn("_qnorm", _norm(F.col("_qvec")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), qd.alias("_cvec")
    ).withColumn("_cnorm", _norm(F.col("_cvec")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_qvec"), F.col("_cvec"))
             / (F.col("_qnorm") * F.col("_cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy dependency at executors)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def ivf_index(embeddings: DataFrame, n_clusters: int = 16, iters: int = 2,
              id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF coarse quantizer: Lloyd iterations entirely in DataFrame ops.

    Returns (assigned, centroids) where ``assigned`` adds a ``cluster``
    column and ``centroids`` is the driver-side list of centroid
    vectors (small: n_clusters x dim doubles).

    Deterministic: seeds are the ``n_clusters`` lowest-id vectors; each
    iteration assigns by max dot product (centroids broadcast as
    literals — no shuffle for assignment) and recomputes means via
    posexplode + groupBy(cluster, pos), a single shuffle per iteration
    keyed on (cluster, dimension) — scales with corpus size, never
    with pair count.
    """
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def assign(df, centroids):
        scores = [
            _dot(vd, F.array(*[F.lit(w) for w in c])).alias(f"_s{j}")
            for j, c in enumerate(centroids)
        ]
        best = F.array_position(
            F.array(*[F.col(f"_s{j}") for j in range(len(centroids))]),
            F.array_max(F.array(*[F.col(f"_s{j}") for j in range(len(centroids))])),
        ) - 1
        return (
            df.select(F.col(id_col), F.col(vec_col), *scores)
            .withColumn("cluster", best.cast("int"))
            .drop(*[f"_s{j}" for j in range(len(centroids))])
        )

    seeds = embeddings.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    assigned = assign(embeddings, centroids)
    for _ in range(iters):
        means = (
            assigned.select("cluster", F.posexplode(vd).alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
            .select("cluster", F.col("ms.m").alias("centroid"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in means:
            new_centroids[r["cluster"]] = [float(x) for x in r["centroid"]]
        centroids = new_centroids
        assigned = assign(embeddings, centroids)
    return assigned, centroids


def ivf_topk(assigned: DataFrame, centroids: list, queries: DataFrame, k: int = 10,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF search: score only vectors in each query's ``nprobe`` nearest
    cells. Same output shape as :func:`cosine_topk`; recall rises with
    nprobe (nprobe == n_clusters degenerates to exact brute force)."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scores = F.array(*[_dot(vd, F.array(*[F.lit(w) for w in c])) for c in centroids])
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    ranked = F.slice(
        F.col("_pairs"),  # sorted desc by score
        1,
        nprobe,
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
        .withColumn(
            "_pairs",
            F.reverse(
                F.array_sort(
                    F.zip_with(
                        F.array(*[_dot(F.transform(F.col("_qvec"), lambda x: x.cast("double")),
                                       F.array(*[F.lit(w) for w in c])) for c in centroids]),
                        idx,
                        lambda s, i: F.struct(s.alias("score"), i.alias("cluster")),
                    )
                )
            ),
        )
        .withColumn("probe", F.explode(ranked["cluster"]))
        .select("query_id", "_qvec", F.col("probe").cast("int").alias("cluster"))
    )
    scored = (
        assigned.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"), "cluster")
        .join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank")
    )


def lsh_cosine_buckets(embeddings: DataFrame, dim: int, n_planes: int = 16, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane signature: (id, vec, bucket: long).

    bucket bit j = sign(v . plane_j). Cosine-close vectors collide with
    high probability; the bucket is a plain long, so the follow-up
    join hash-partitions evenly.
    """
    planes = _planes(dim, n_planes, seed)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = [
        F.when(_dot(vd, F.array(*[F.lit(w) for w in plane])) > 0,
               F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        for j, plane in enumerate(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket.bitwiseOR(b)
    return embeddings.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_cosine_topk(embeddings: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                    n_planes: int = 8, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Recall improves with fewer planes (bigger buckets) — callers pick
    the trade-off. Same output shape as :func:`cosine_topk`.
    """
    corpus = lsh_cosine_buckets(embeddings, dim, n_planes, seed, id_col, vec_col)
    qb = lsh_cosine_buckets(queries, dim, n_planes, seed, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"), "bucket"
    )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"), "bucket")
        .join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity_col(F.col("_qvec"), F.col("_cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank")
    )


def cosine_topk_vectorized(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k, Arrow/numpy physical strategy.

    Same logical op (and same results) as :func:`cosine_topk`, executed
    as a ``mapInPandas`` batch matmul: the normalized query matrix
    ships in the task closure, each Arrow batch scores ``C @ Q.T`` in
    one BLAS call and emits only its LOCAL top-k per query, so the
    final shuffle carries ``k x |queries|`` rows per batch instead of
    the whole score matrix. The win over the zip_with/aggregate fold
    grows with vector width (SIMD vs per-element codegen); it is the
    right plan when |corpus| x |queries| dominates the cost.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    qm = np.array([[float(x) for x in r[vec_col]] for r in q_rows], dtype=np.float64)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cn = c / np.linalg.norm(c, axis=1, keepdims=True)
            s = cn @ qn.T  # (batch, n_queries)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(q_ids)):
                col = s[:, qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                # local top-k with the global (cosine desc, id asc) tiebreak
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))[:k]
                sel = cand_idx[order]
                out_q.extend([q_ids[qi]] * len(sel))
                out_n.extend(ids[sel])
                out_c.extend(col[sel])
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_c})

    scored = embeddings.mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank")
    )


def cosine_near_duplicates(embeddings: DataFrame, threshold: float,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-duplicate pairs: ``(id_a, id_b, cosine)``
    for every pair at or above ``threshold`` (id_a < id_b).

    This is the EXACT O(n^2) verifier — the right tool for corpus
    slices, audits, and as the oracle-checkable ground truth. At full
    corpus scale, generate candidates with :func:`lsh_cosine_buckets`
    (probabilistic recall) or :func:`ivf_index` partitioning first and
    run this only within buckets; the pair schema is identical, so
    downstream clustering (`functions.cluster.dedup_clusters`) accepts
    either source unchanged.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path
# ---------------------------------------------------------------------------

def pq_train(embeddings: DataFrame, m: int = 4, k: int = 16, iters: int = 5,
             sample_rows: int = 2048, id_col: str = "vec_id",
             vec_col: str = "embedding") -> list:
    """Train PQ codebooks: split D dims into ``m`` subvectors, run
    k-means (``k`` centroids) per subspace. Returns
    ``codebooks[m][k][D/m]`` (plain lists — broadcastable literals).

    Training runs DRIVER-SIDE on a deterministic bounded sample (the
    ``sample_rows`` lowest ids) — the faiss convention: codebooks need
    only a representative sample, never the corpus, so training cost is
    O(sample) regardless of corpus size. Encoding and search (below)
    are the distributed passes. Deterministic: fixed seeds (first k
    sample points per subspace), fixed iteration count.
    """
    import numpy as np

    rows = (
        embeddings.orderBy(id_col).limit(sample_rows)
        .select(vec_col).collect()
    )
    x = np.asarray([[float(v) for v in r[vec_col]] for r in rows], dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    codebooks = []
    for s in range(m):
        xs = x[:, s * sub:(s + 1) * sub]
        cents = xs[:k].copy()  # deterministic seeds: first k sample points
        for _ in range(iters):
            # squared-L2 assignment; empty clusters keep their centroid
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(k):
                pts = xs[a == j]
                if len(pts):
                    cents[j] = pts.mean(axis=0)
        codebooks.append(cents.tolist())
    return codebooks


def pq_encode(embeddings: DataFrame, codebooks: list, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Distributed PQ encode: each vector -> ``m`` one-byte-ish codes
    (nearest centroid per subspace). Arrow/numpy kernel, no shuffle —
    the output is m smallints per vector instead of D floats (e.g.
    64 x 8B doubles -> 4 codes: a ~128x memory cut before ANN search).
    """
    import numpy as np

    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]
    m = len(cb)
    sub = cb[0].shape[1]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray([[float(v) for v in e] for e in pdf[vec_col]], dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * sub:(s + 1) * sub]
                d2 = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes.tolist())})

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, codes array<int>"
    )


def pq_adc_topk(codes: DataFrame, codebooks: list, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Asymmetric-distance search over PQ codes: per query, precompute a
    (m x k) lookup table of subspace squared distances, then score each
    code vector by summing m table lookups — never reconstructing the
    corpus. Arrow kernel with per-batch local top-k, then a global
    top-k per query (TakeOrderedAndProject-sized final state).

    Returns (query_id, neighbor_id, adc_dist, rank) — approximate by
    construction; recall is pinned by tests against exact search.
    """
    import numpy as np

    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]
    m = len(cb)
    sub = cb[0].shape[1]
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    q_ids = [int(r["query_id"]) for r in q_rows]
    qx = np.asarray([[float(v) for v in r["qv"]] for r in q_rows], dtype=np.float64)
    # LUT[q][s][code] = ||q_sub - centroid||^2
    luts = np.stack([
        ((qx[:, s * sub:(s + 1) * sub][:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        for s in range(m)
    ], axis=1)  # (nq, m, k_centroids)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            c = np.asarray(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            out = []
            for qi, qid in enumerate(q_ids):
                # gather: sum over subspaces of LUT[qi, s, code]
                dist = luts[qi][np.arange(m)[None, :], c].sum(axis=1)
                take = min(k, len(dist))
                part = np.argpartition(dist, take - 1)[:take]
                for j in part:
                    out.append((qid, int(ids[j]), float(dist[j])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "adc_dist"])

    local = codes.select(id_col, "codes").mapInPandas(
        kernel, "query_id long, neighbor_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )


def ivfpq_build(embeddings: DataFrame, n_clusters: int = 16, m: int = 4,
                k: int = 16, kmeans_iters: int = 3, pq_iters: int = 5,
                sample_rows: int = 2048, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """IVF-PQ composite index (the faiss flagship layout): IVF coarse
    cells partition the corpus; PQ codebooks quantize the RESIDUAL
    (vector minus its cell centroid), which is far more compressible
    than the raw vector. Returns (coded, centroids, codebooks) where
    ``coded`` carries (id, cluster, codes).

    Every stage reuses the standalone operators: Lloyd assignment from
    :func:`ivf_index`, codebook training from :func:`pq_train` (on a
    bounded residual sample), encoding from :func:`pq_encode` — the
    composite is pure composition, no new distributed shapes.
    """
    assigned, centroids = ivf_index(embeddings, n_clusters, kmeans_iters,
                                    id_col, vec_col)
    cent_arr = [F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    # when-chain resolves each row's own centroid literal
    cent_col = None
    for j, ca in enumerate(cent_arr):
        branch = F.when(F.col("cluster") == j, ca)
        cent_col = branch if cent_col is None else cent_col.when(F.col("cluster") == j, ca)
    residuals = assigned.select(
        id_col, "cluster",
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            cent_col,
            lambda a, b: a - b,
        ).alias("_res"),
    )
    codebooks = pq_train(residuals, m=m, k=k, iters=pq_iters,
                         sample_rows=sample_rows, id_col=id_col, vec_col="_res")
    coded = pq_encode(residuals, codebooks, id_col=id_col, vec_col="_res") \
        .join(residuals.select(id_col, "cluster"), id_col)
    return coded, centroids, codebooks


def ivfpq_topk(coded: DataFrame, centroids: list, codebooks: list,
               queries: DataFrame, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ search: probe each query's ``nprobe`` nearest cells, score
    only those cells' codes by residual ADC (LUTs built per (query,
    probed cell) against the query's own residual). The scan prunes to
    nprobe/n_clusters of the corpus BEFORE any distance math — the
    IVF pruning and PQ memory cut compose."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    cb = [np.asarray(c, dtype=np.float64) for c in codebooks]
    m = len(cb)
    sub = cb[0].shape[1]
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    q_ids = [int(r["query_id"]) for r in q_rows]
    qx = np.asarray([[float(v) for v in r["qv"]] for r in q_rows], dtype=np.float64)
    # per query: nprobe nearest cells by L2, and a residual LUT per cell
    d2c = ((qx[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(d2c, axis=1)[:, :nprobe]  # (nq, nprobe)
    luts = {}
    for qi in range(len(q_ids)):
        for c in probes[qi]:
            res = qx[qi] - cents[c]
            luts[(qi, int(c))] = np.stack([
                ((res[s * sub:(s + 1) * sub][None, :] - cb[s]) ** 2).sum(axis=1)
                for s in range(m)
            ])  # (m, k)

    probe_rows = [(q_ids[qi], int(c)) for qi in range(len(q_ids)) for c in probes[qi]]
    qi_of = {qid: i for i, qid in enumerate(q_ids)}

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            clusters = pdf["cluster"].to_numpy()
            for qid, c in probe_rows:
                mask = clusters == c
                if not mask.any():
                    continue
                lut = luts[(qi_of[qid], c)]
                cc = codes[mask]
                dist = lut[np.arange(m)[None, :], cc].sum(axis=1)
                take = min(k, len(dist))
                part = np.argpartition(dist, take - 1)[:take]
                sel = ids[mask]
                for j in part:
                    out.append((qid, int(sel[j]), float(dist[j])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "adc_dist"])

    local = coded.select(id_col, "cluster", "codes").mapInPandas(
        kernel, "query_id long, neighbor_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("adc_dist", 6).alias("adc_dist"), "rank")
    )


def knn_graph(embeddings: DataFrame, k: int = 5, mutual: bool = True,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """k-nearest-neighbor graph over the embedding corpus.

    Directed edges are each vector's exact top-k by cosine (the same
    deterministic ranking as :func:`cosine_topk`); ``mutual=True``
    keeps only edges present in BOTH directions — the mutual-kNN graph
    that seeds semantic clustering and graph-based dedup — emitted once
    as (src, dst, cosine) with src < dst.

    An exact kNN graph is quadratic by definition; this is the small-N
    baseline (and the oracle for the approximate paths). At corpus
    scale, swap the scoring stage for IVF-cell or LSH-bucket candidate
    generation (:func:`ivf_topk`, :func:`lsh_cosine_topk`) — the
    mutual-join stage is unchanged and linear in edge count.
    """
    edges = cosine_topk(embeddings, embeddings, k, id_col=id_col, vec_col=vec_col)
    if not mutual:
        return edges
    rev = edges.select(
        F.col("neighbor_id").alias("query_id"), F.col("query_id").alias("neighbor_id")
    )
    return (
        edges.join(rev, ["query_id", "neighbor_id"], "left_semi")
        .filter(F.col("query_id") < F.col("neighbor_id"))
        .select(
            F.col("query_id").alias("src"),
            F.col("neighbor_id").alias("dst"),
            "cosine",
        )
    )


def semdedup(embeddings: DataFrame, n_clusters: int = 16, threshold: float = 0.97,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering then
    pruning within-cluster near-duplicates.

    1. k-means the corpus (the deterministic DataFrame-native Lloyd of
       :func:`ivf_index` — same clusters on any engine/partitioning);
    2. score cosine ONLY within a cluster (the point of the method: the
       pair join is per-cluster, never corpus-quadratic);
    3. greedy keep-lowest-id: a vector is dropped iff some smaller-id
       vector in its cluster scores >= threshold.

    Returns the surviving rows with their ``cluster``. One cluster-keyed
    self-join + one anti-join; hot clusters are the skew risk at scale —
    cap cluster size upstream (raise n_clusters so expected cluster size
    is ~sqrt(corpus)/machine) or let AQE skew-split the join.
    """
    assigned, _ = ivf_index(embeddings, n_clusters=n_clusters, iters=iters,
                            id_col=id_col, vec_col=vec_col)
    a = assigned.select(F.col("cluster"), F.col(id_col).alias("_ida"),
                        F.col(vec_col).alias("_va"))
    b = assigned.select(F.col("cluster"), F.col(id_col).alias("_idb"),
                        F.col(vec_col).alias("_vb"))
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cosine_similarity_col(F.col("_va"), F.col("_vb")) >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti")


def two_stage_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                   coarse_dims: int = 16, shortlist: int = 100,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Coarse-to-fine retrieval: rank by the first ``coarse_dims``
    dimensions to a per-query ``shortlist``, then re-rank the
    shortlist with full-dimension cosine — the Matryoshka-truncation
    serving pattern (Kusupati et al. 2022): the cheap prefix scan does
    the data-volume work, the expensive exact score touches only
    ``shortlist`` rows per query.

    At 100 TB the stage-1 scan reads ``coarse_dims/dim`` of the vector
    bytes per pair (a column-pruned prefix if vectors are stored
    dimension-sliced) and stage 2 is bounded by shortlist * queries —
    independent of corpus size. Both stages are deterministic
    (value-desc, id-asc ranking), so the whole operator — including
    its recall behavior — replays exactly in the SQL oracle.

    Norms are hoisted to per-row projections (interpreted HOF lambdas
    see no CSE — same rationale as :func:`cosine_topk`).
    """
    full = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    coarse = F.transform(
        F.slice(F.col(vec_col), 1, coarse_dims), lambda x: x.cast("double")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            full.alias("_qfull"), coarse.alias("_qcoarse"),
        )
        .withColumn("_qn", _norm(F.col("_qfull")))
        .withColumn("_qcn", _norm(F.col("_qcoarse")))
    )
    c = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            full.alias("_cfull"), coarse.alias("_ccoarse"),
        )
        .withColumn("_cn", _norm(F.col("_cfull")))
        .withColumn("_ccn", _norm(F.col("_ccoarse")))
    )
    coarse_cos = _dot(F.col("_qcoarse"), F.col("_ccoarse")) / (F.col("_qcn") * F.col("_ccn"))
    stage1 = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_coarse", coarse_cos)
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("_coarse"), F.asc("neighbor_id"))
    short = stage1.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= shortlist)
    full_cos = _dot(F.col("_qfull"), F.col("_cfull")) / (F.col("_qn") * F.col("_cn"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("_full"), F.asc("neighbor_id"))
    return (
        short.withColumn("_full", full_cos)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round(F.col("_full"), 6).alias("cosine"), "rank",
        )
    )
