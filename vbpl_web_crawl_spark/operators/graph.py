"""Connected components over near-duplicate pair edges — the step that
turns LSH candidate PAIRS into dedup CLUSTERS (keep one doc per
component). MinHash/SimHash/winnowing emit pairs; transitively linked
pairs must collapse to one representative, which is exactly connected
components on the pair graph.

Implementation: hash-min label propagation as iterative DataFrame
joins — every node starts labeled with its own id; each round every
node takes the min label over itself and its neighbors; stop when no
label changes. Deterministic (min is order-free), each round is ONE
shuffle join + ONE aggregation, and the loop is driver-coordinated
exactly like MLlib/GraphX iterations. Rounds needed = graph diameter;
dedup components are tiny dense clusters (diameter 2-4), so the loop
ends after a handful of rounds. For adversarial long-chain graphs the
published fix is alternating large-star/small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which this
loop structure accommodates without changing the driver protocol.

The DuckDB oracle is an INDEPENDENT implementation: a WITH RECURSIVE
transitive closure + min-reachable-node per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(src, dst) undirected edges -> (node, cluster_id) with
    cluster_id = min node id in the component. Nodes = endpoints of
    edges (isolated nodes never appear in a pair list)."""
    both = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    both = both.persist()
    labels = both.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(max_iter):
        # neighbor minimum: min label over adjacent nodes
        nbr_min = (
            both.join(labels, both.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # localCheckpoint per round: materializes AND truncates the
        # logical plan — without it the plan nests once per iteration
        # and Catalyst analysis time grows exponentially with rounds
        # (the standard iterative-DataFrame pitfall; MLlib checkpoints
        # the same way)
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    out = labels.select("node", F.col("label").alias("cluster_id"))
    both.unpersist()
    return out
