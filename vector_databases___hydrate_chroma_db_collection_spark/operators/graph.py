"""Connected components over near-duplicate pair graphs.

Completes the dedup story the reference motivates (hydrate-for-
retrieval wants one copy per duplicate *cluster*, reference
README.md:5): pair emitters (``dedup.jaccard_pairs``,
``dedup.minhash_lsh_pairs``, ``ann.ivf_neardup_pairs``) produce
edges; this module groups them into components so a pipeline can
keep ``min(id)`` per component and drop the rest.

Algorithm: iterative min-label propagation — every node starts
labeled with its own id; each round every node adopts the minimum
label among itself and its neighbors; fixpoint = components. Each
round is one shuffle (join on node id + hash re-aggregation), all
codegen — no Python in the loop. Rounds needed = graph diameter,
and near-dup graphs are shallow (clusters are cliques or near-
cliques from LSH banding), so 3-5 rounds is typical; ``max_iter``
bounds pathological chains. Lineage is truncated with
``localCheckpoint`` every round so the plan does not grow with the
iteration count (a 50-round logical plan would choke the optimizer
long before the data hurt).

At 100 TB-scale edge sets the published refinement is the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which rewires edges
toward component minima to cut the round count to
O(log^2 n) on adversarial graphs; min-label propagation is the
same per-round dataflow (join + min-agg), so swapping the round
body in would not change the Spark plan shape. Not needed for
near-dup dedup where diameter is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Component id (= min node id in the component) for every node
    that appears in ``edges``. Returns ``(node, component)``.

    Isolated nodes (no edges) are the caller's concern — they are
    their own component and never enter the pair graph; union them
    in afterwards if the full corpus assignment is needed (see
    ``dedup_connected_components`` in queries.py).

    Determinism: min() over bigint labels is order-independent, so
    the fixpoint is unique regardless of partitioning — safe for
    oracle comparison.
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    # Keep the adjacency in memory: it is re-joined every round.
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.groupBy("node")
        .agg(F.min("nbr").alias("component"))
        .withColumn("component", F.least(F.col("component"), F.col("node")))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # Neighbor labels: for each node, the min label over its
        # neighborhood; merged with its own label. One shuffle per
        # side of the join + one for the agg — all hash-partitioned
        # on node ids, skew-safe for near-dup graphs (cluster sizes
        # are bounded by the pair emitters' bucket caps).
        propagated = (
            sym.join(labels.withColumnRenamed("node", "nbr"), on="nbr")
            .groupBy("node")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(propagated, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), on="node")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        # Exhausting max_iter without a fixpoint means at least one
        # true component is still split across labels — a silently
        # wrong dedup keep-set downstream. Long chains (diameter >
        # max_iter) are the trigger; raise loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "rounds — the graph has a longer chain than max_iter; "
            "raise max_iter (cost: one join+agg round each)"
        )
    # Superseded per-round checkpoints are reclaimed by Spark's
    # ContextCleaner once their Python references drop (only the
    # final ``labels`` survives this frame) — accumulation during the
    # loop is bounded by rounds x O(nodes) rows and transient.
    return labels


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    decimals: int | None = 6,
) -> DataFrame:
    """Weighted PageRank over a directed edge list -> (node, rank).

    PR_{t+1}(v) = (1-d)/N + d * Σ_u PR_t(u) · w(u,v)/outw(u), started
    from the uniform 1/N vector and iterated a FIXED number of rounds
    (fixed rounds, not convergence-test, keeps the result closed-form
    and oracle-checkable as unrolled SQL). Dangling mass is dropped,
    matching the unrolled-SQL semantics.

    Each round is one broadcast-or-shuffle join (ranks are one row
    per node — small next to edges) plus one hash re-aggregation on
    the destination key; the edge table is normalized and EAGERLY
    localCheckpointed once up front (without it every round would
    re-run the caller's full edge build — measured 1.8x on the
    trade-flow query), so at 100 TB the per-round cost is a single
    edge-partitioned shuffle. Rank lineage is truncated with a lazy
    localCheckpoint each round (same reasoning as
    connected_components: plans must not grow with iterations).
    Rank sums per destination are float adds over its in-degree;
    ``decimals`` rounds the FINAL ranks for engine-portable compares.
    """
    w = F.col(weight) if weight is not None else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    )
    outw = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    # Materialize the normalized edge table and node set ONCE — both
    # are re-joined every iteration, and without the eager checkpoint
    # Spark re-runs the full upstream edge build (often a multi-join
    # over fact tables) per round. Checkpointing also truncates their
    # lineage out of every iteration's plan.
    norm = (
        e.join(outw, "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_ow")).alias("_p"))
        .localCheckpoint()
    )
    nodes = (
        norm.select(F.col("_s").alias("node"))
        .unionByName(norm.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # Empty edge set (e.g. every edge filtered as a self-loop):
        # the natural result is an empty rank table, not a
        # ZeroDivisionError from the (1-d)/N teleport term.
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contrib = (
            norm.join(ranks, norm["_s"] == ranks["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + damping * F.coalesce("_in", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=False)
        )
    if decimals is not None:
        ranks = ranks.select("node", F.round("rank", decimals).alias("rank"))
    return ranks
