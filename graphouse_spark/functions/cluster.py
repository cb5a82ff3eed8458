"""Connected components over a similarity-pair graph -> dedup clusters.

The dedup family (MinHash/LSH, SimHash, n-gram Jaccard, winnowing)
produces PAIRS of near-duplicate documents; a training-data pipeline
needs CLUSTERS — "keep one representative per component" — which is
connected components over the pair graph.

Spark-first design (no GraphX / graphframes dependency):
- min-label propagation: every node starts labeled with itself; each
  round a node takes the min label among itself and its neighbors.
  Converges in O(graph diameter) rounds — near-dup components are
  small dense cliques, so 2-4 rounds in practice.
- each round is one shuffle join (edges x labels, both hash-partitioned
  on the join key) + a partial/final min aggregation — the same plan a
  1000-executor cluster runs without driver involvement. The only
  driver-side values are the per-round change count (the convergence
  test) and the loop itself.
- ``localCheckpoint(eager=True)`` after each round truncates the plan
  lineage so the iteration count doesn't stack Catalyst plans (the
  classic iterative-algorithm pitfall at scale).
- at extreme scale (trillions of edges, high-diameter graphs) the
  known upgrade is alternating large-star/small-star contraction
  [Kiveris et al., "Connected Components in MapReduce and Beyond"],
  which converges in O(log^2 n); the label-propagation loop here keeps
  the same join-agg shape per round, so swapping the round body is a
  local change.

Oracle: DuckDB recursive CTE computes the transitive closure and takes
min(reachable node) per node — exact same component ids (min node id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _driver_components(one_way: DataFrame) -> DataFrame:
    """Union-find over a COLLECTED edge list — the finisher for
    metadata-sized graphs. Near-dup pair graphs collapse to thousands
    of edges once exact-duplicate cliques are folded (see
    :func:`simhash_dedup_clusters`); burning four distributed
    join-agg-checkpoint cycles on that is all fixed job overhead. The
    caller gates on edge COUNT, so at 100 TB a genuinely large graph
    still takes the iterative path below. Union-by-min + path
    compression keeps every root the component minimum, matching the
    loop's canonical labels exactly."""
    import pandas as pd

    pdf = one_way.toPandas()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"], pdf["v"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    nodes = set(pdf["u"]).union(pdf["v"])
    out = pd.DataFrame(
        {"node": list(nodes)}).assign(component=lambda d: d["node"].map(find))
    schema = StructType([
        StructField("node", one_way.schema["u"].dataType),
        StructField("component", one_way.schema["u"].dataType),
    ])
    return one_way.sparkSession.createDataFrame(out, schema)


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 25,
                         driver_threshold: int = 1_000_000) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component).

    ``component`` is the minimum node id in the node's component (a
    canonical, engine-independent label). Only nodes that appear in at
    least one edge are returned; isolated nodes are trivially their own
    component and never enter the pair graph.

    Graphs at or under ``driver_threshold`` edges (after the initial
    materialization, whose count is free) finish driver-side with
    union-find — O(E a(E)) in microseconds versus O(log d) distributed
    cycles of pure job overhead. Pass ``driver_threshold=0`` to force
    the iterative path (the tests do, to keep it honest).
    """
    # materialize the (possibly expensive) upstream pair DAG ONCE before
    # symmetrizing: the union's two branches would otherwise each
    # recompute it — for LSH-generated edges that doubles the whole
    # candidate-generation cost
    one_way = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(eager=True)
    if driver_threshold and one_way.count() <= driver_threshold:
        return _driver_components(one_way)
    sym = one_way.unionByName(one_way.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint(eager=True)  # reused every round: materialize once

    # seed labels with the first neighbor-min fold for free: one agg over
    # sym replaces the distinct-nodes scan AND a whole propagate step
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select(F.col("u").alias("node"), F.least("u", "_mv").alias("component"))
        .localCheckpoint(eager=True)
    )
    def propagate(lbl: DataFrame) -> DataFrame:
        """One neighbor-min + pointer-jump step -> (node, component, _changed).

        Pointer jumping (adopt the label OF my label) turns the
        O(diameter) neighbor-min walk into O(log diameter): a 12-deep
        near-dup chain converges in ~4 doubled steps, not 12.
        """
        neighbor_min = (
            sym.join(lbl, sym["v"] == lbl["node"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            lbl.join(neighbor_min, lbl["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
        )
        by_node = stepped.select(F.col("node").alias("_c"), F.col("component").alias("_cc"))
        return (
            stepped.join(by_node, stepped["component"] == by_node["_c"], "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("_cc"), F.col("component"))).alias("component"),
                (F.col("_changed") | (F.col("_cc") < F.col("component"))).alias("_changed"),
            )
        )

    for _ in range(max_iters):
        # two propagation steps per materialization: a checkpoint + the
        # convergence count are one Spark job each, so halving the number
        # of checkpointed cycles halves the loop's fixed cost. Convergence
        # reads only the SECOND step's _changed — if the latest step moved
        # nothing, the iteration is at its fixed point regardless of what
        # the first step did. NOTE: the pointer-jump self-join computes
        # ``stepped`` twice (Catalyst does not dedupe the common subplan),
        # so chaining MORE uncheckpointed steps per cycle doubles work
        # per extra step (2^k recompute) — measured as a hang at 8 steps;
        # two steps per checkpoint is the optimum for this shape.
        new_labels = propagate(propagate(labels).drop("_changed"))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-duplicate pairs -> (doc_id, cluster_id, n_members).

    cluster_id = min doc_id in the component; n_members counts the
    component's documents via a count window over the labels (r14,
    guide §2.4: the earlier aggregate+join-back duplicated the labels
    subtree on both sides of a self-join — neither ReuseExchange nor
    AQE's stage cache collapsed the copies; the window is one linear
    pass with the same per-component colocation the join needed).
    """
    comp = connected_components(pairs, id_a, id_b)
    wc = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(wc).alias("n_members"),
    )


def simhash_dedup_clusters(docs: DataFrame, max_hamming: int = 2,
                           text_col: str = "text", id_col: str = "doc_id",
                           bits: int = 60, hash_fn: str = "md5",
                           strategy: str = "engine") -> DataFrame:
    """``dedup_clusters(simhash_near_duplicates(docs))`` with identical
    results, but identical FINGERPRINTS collapse to one representative
    node (the group's min id) before the banded join and the
    components loop.

    Why it matters: near-dup corpora are dominated by exact-duplicate
    cliques — a 251-member identical-fingerprint group alone is 31k
    verified pairs that the pair-graph formulation joins, shuffles and
    propagates over, yet contributes ZERO information to connectivity
    (hamming-0 members are interchangeable). Collapsing first makes
    the edge list track the number of DISTINCT fingerprints within
    hamming distance, not clique sizes; members rejoin by fingerprint
    afterwards (one broadcastable metadata-sized join).

    Equivalence: hamming depends only on fingerprints, so components
    over docs = components over distinct fingerprints expanded back;
    the min doc of a component is the min over its groups' reps (each
    rep IS its group's min); a doc appears in the pair graph iff its
    fingerprint has >= 2 members (hamming-0 edge) or its rep has a
    banded edge. The driver oracle (recursive-CTE closure over the
    brute-force hamming graph) pins all of this.
    """
    from graphouse_spark.functions.dedup import (
        banded_hamming_pairs, simhash, simhash_np)

    par = docs.sparkSession.sparkContext.defaultParallelism
    if strategy == "arrow":
        if hash_fn != "md5":
            raise ValueError("strategy='arrow' implements the md5 family")
        sigs = simhash_np(docs.repartition(par), text_col, id_col, bits
                          ).localCheckpoint(eager=True)
    elif strategy == "engine":
        sigs = simhash(docs.repartition(par), text_col, id_col, bits, hash_fn
                       ).localCheckpoint(eager=True)
    else:
        raise ValueError(f"strategy must be engine|arrow, got {strategy!r}")
    groups = (
        sigs.groupBy("simhash")
        .agg(F.min(id_col).alias("rep"), F.count(F.lit(1)).alias("_n_fp"))
    )
    rep_pairs = banded_hamming_pairs(
        groups.select(F.col("rep").alias(id_col), "simhash"),
        max_hamming, id_col, bits)
    comp = connected_components(rep_pairs, "id_a", "id_b")
    labeled = (
        groups.join(comp, groups["rep"] == comp["node"], "left")
        .select(
            "simhash",
            F.coalesce("component", F.col("rep")).alias("cluster_id"),
            # in the pair graph iff the fp is shared or has a neighbor
            ((F.col("_n_fp") >= 2) | F.col("component").isNotNull()).alias("_in"),
        )
        .filter(F.col("_in"))
    )
    members = sigs.join(labeled, "simhash").select(id_col, "cluster_id")
    # n_members via a count window, not an aggregate joined back: the
    # join form put `members` on BOTH sides of a self-join and the
    # whole sigs⋈labeled subtree was computed twice (verified in
    # plans/r14/doc_dedup_clusters_before.txt — no exchange reuse);
    # the window is one linear pass with the same per-cluster
    # colocation the join needed (guide §2.4)
    wc = Window.partitionBy("cluster_id")
    return members.select(
        F.col(id_col).alias("doc_id") if id_col != "doc_id" else F.col(id_col),
        "cluster_id",
        F.count(F.lit(1)).over(wc).alias("n_members"))


def cluster_representatives(docs: DataFrame, clusters: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (the cluster_id member) per cluster plus
    all unclustered docs — the actual dedup 'writer' of the pipeline.

    Left-anti join removes every clustered doc that is not its own
    cluster representative; the clusters side is small (near-dups are
    a fraction of the corpus), so this broadcasts.
    """
    losers = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return docs.join(F.broadcast(losers), id_col, "left_anti")
