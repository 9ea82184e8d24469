"""Connected components over a DataFrame edge set (dedup clustering leg).

One operator: ``min_label_components`` — iterative min-label propagation
with a pointer-jumping (label-chasing) step per round, so convergence takes
O(log diameter) rounds instead of O(diameter). Both steps are plain shuffle
joins over the EDGE set and the label table (never the corpus), the 100 TB
shape for near-dup clustering: labels and edges hash-partition on the join
key, each round's plan is truncated with localCheckpoint.

Public algorithms: label propagation to the min neighbor is folklore;
the logarithmic-round chase is the "hash-to-min" idea of Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds"
(ICDE'13); the alternating small-star/large-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) is the documented
drop-in if even log-diameter rounds are too many.

Correctness of the early exit: the chase step only accelerates — any state
where one more neighbor-min round changes nothing is a fixed point of pure
min propagation, and every such fixed point is exact (induction outward
from the component's min vertex: its neighbors must already hold the min,
then their neighbors, ...). So ``changed == 0`` certifies the answer, and
exhausting ``max_rounds`` without it is an ERROR, never a silent return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Exact connected components of the undirected graph given by
    ``pairs`` (columns ``d1``, ``d2``; one row per edge, either order).

    Returns (doc_id, cluster_id) for every vertex incident to an edge,
    where cluster_id is the lexicographic min vertex id of its component
    (deterministic representative). Vertices with no edges don't appear —
    callers treat absence as "its own singleton cluster".

    Raises RuntimeError if ``max_rounds`` rounds pass without convergence
    (a silent fall-through here would return WRONG cluster ids for any
    component needing more rounds — with the chase step that takes
    diameter > 2^max_rounds, but wrong-loudly beats wrong-silently).
    """
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    edges = pairs.select("d1", "d2").unionByName(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    ).cache()
    try:
        return _propagate(edges, max_rounds)
    finally:
        edges.unpersist()


def _propagate(edges: DataFrame, max_rounds: int) -> DataFrame:
    labels = (
        edges.select(F.col("d1").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    ).localCheckpoint()
    for _ in range(max_rounds):
        nbr = (
            edges.join(labels, edges.d2 == labels.doc_id)
            .groupBy(F.col("d1").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # pointer jumping: label(label(v)) — cluster_id is always a vertex
        # id present in the label table (it starts as one and min/chase
        # keep it one), so this inner join is total
        chase = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.cluster_id") == F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.cluster_id").alias("chase_min"),
            )
        )
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .join(chase, "doc_id")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("nbr_min", F.col("cluster_id")),
                    F.col("chase_min"),
                ).alias("cluster_id"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"min_label_components: no convergence after {max_rounds} "
            f"rounds ({changed} labels still changing) — component "
            "diameter exceeds 2^rounds; raise max_rounds (or switch to the "
            "small-star/large-star variant, module docstring)"
        )
    # labels is localCheckpoint-materialized, so the caller's finally can
    # safely unpersist the edge cache before labels is consumed
    return labels


def pagerank_mu(
    pairs: DataFrame,
    iters: int = 12,
    total_mu: int = 10**12,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """Integer-micro-unit PageRank (Page et al. 1999) over the undirected
    edge set ``pairs`` (columns ``d1``, ``d2``; one row per unordered
    edge) — the graph-centrality leg of the dedup/similarity surface: on
    a near-dup candidate graph, high rank marks template/boilerplate
    hubs a training pipeline wants to inspect before keeping "one
    representative per cluster".

    Cross-engine exactness discipline (the label_centroids convention
    applied to an ITERATIVE algorithm): rank mass is held as int64
    micro-units of ``total_mu``, every transfer is an integer floor —
    per-edge send = (d_num*rank) div (d_den*deg), per-node teleport
    base = ((d_den-d_num)*total_mu) div (d_den*n) — so each iteration is
    a sum of integers, order-independent and bit-identical to any
    sequential re-implementation (pinned against a pure-Python twin in
    tests/test_graph.py). Floored remainders deliberately leak mass:
    ranks are comparable scores, not a probability simplex.

    100 TB shape: the classic distributed PageRank loop — each iteration
    one edge-keyed shuffle join (rank table joins edges on src) and one
    dst-keyed partial-agg sum; the rank table is node-sized, edges are
    never re-derived, and the plan is truncated per iteration with
    localCheckpoint exactly like ``min_label_components`` (an un-truncated
    12-iteration lineage is the driver-side failure mode at scale).
    Isolated vertices don't appear (callers treat absence as rank 0);
    every vertex here has deg >= 1, so there is no dangling mass.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    edges = (
        pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("d2").alias("src"), F.col("d1").alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    try:
        deg = edges.groupBy("src").agg(
            F.count("*").cast("long").alias("deg")
        )
        nodes = deg.select(F.col("src").alias("node"), "deg").localCheckpoint()
        n = nodes.count()  # scalar aggregate, never a row collect
        if n == 0:
            return nodes.select(
                "node", F.lit(0).cast("long").alias("rank_mu")
            )
        r0 = total_mu // n
        base = ((d_den - d_num) * total_mu) // (d_den * n)
        rank = nodes.select(
            "node", "deg", F.lit(r0).cast("long").alias("rank_mu")
        ).localCheckpoint()
        for _ in range(iters):
            send = (
                rank.join(edges, rank.node == edges.src)
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"({d_num} * rank_mu) div ({d_den} * deg)"
                    ).alias("_c"),
                )
            )
            recv = send.groupBy("node").agg(
                F.sum("_c").cast("long").alias("_in")
            )
            rank = (
                nodes.join(recv, "node", "left")
                .select(
                    "node",
                    "deg",
                    (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0)))
                    .cast("long")
                    .alias("rank_mu"),
                )
            ).localCheckpoint()
        return rank.select("node", "rank_mu")
    finally:
        edges.unpersist()
