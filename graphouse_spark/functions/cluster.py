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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 25) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component).

    ``component`` is the minimum node id in the node's component (a
    canonical, engine-independent label). Only nodes that appear in at
    least one edge are returned; isolated nodes are trivially their own
    component and never enter the pair graph.
    """
    # materialize the (possibly expensive) upstream pair DAG ONCE before
    # symmetrizing: the union's two branches would otherwise each
    # recompute it — for LSH-generated edges that doubles the whole
    # candidate-generation cost
    one_way = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(eager=True)
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
    component's documents (one extra partial/final agg + broadcastable
    join back — components are tiny relative to the corpus).
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "n_members",
        )
    )


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
