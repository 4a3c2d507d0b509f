"""Connected components — clustering pairwise near-duplicates into
canonical groups (the dedup endgame: pairs -> clusters -> one canonical
doc per cluster).

Iterative min-label propagation (the standard Pregel-style formulation):
every node repeatedly adopts the smallest label among itself and its
neighbors; at fixed point each component carries its minimum node id.
This is one of the few genuinely iterative operators — the driver loop
re-plans a bounded number of join+aggregate rounds and checks
convergence with a count (an explicitly sanctioned driver action for
iterative algorithms; each round is fully distributed).

Scale notes: rounds needed = graph diameter (near-dup components are
shallow — usually 2-4 rounds).  Each round is one shuffle join on the
edge list + one min-aggregate.  For web-scale graphs swap in the
large-star/small-star algorithm (Kiveris et al.) — same primitive ops,
fewer rounds on skewed degree distributions; persist labels per round
(done below) so lineage doesn't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Component assignment for every node appearing in `edges`.

    Returns (node, component) where component = min node id reachable.
    Edges are treated as undirected.
    """
    # localCheckpoint (not persist) per round: persist caches partitions
    # but KEEPS the lineage, so after r rounds the logical plan nests r
    # join trees and Catalyst re-optimizes an exponentially growing tree
    # every iteration — measured driver OOM near round 20 on a
    # long-chain graph.  Checkpointing truncates the plan to the
    # materialized result each round; the checkpointed partitions are
    # released when Python drops the reference.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
