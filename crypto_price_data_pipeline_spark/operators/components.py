"""Connected components over a pair graph (dedup clustering).

Near-duplicate detection yields verified PAIRS; turning pairs into
dedup decisions needs the transitive closure — if A~B and B~C, all
three are one cluster even when A~C was never tested. The greedy
keep-min-id rule (minhash_dedup) under-merges chains; this operator
computes true components.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each iteration every node takes the min label in its
neighborhood; converged when the global label sum stops changing (the
sum is monotonically non-increasing, so equality ⇔ fixpoint).
Iterations = graph diameter ≤ ``max_iter``. Each round is one
join + groupBy (shuffle on node id); lineage is truncated per round
with localCheckpoint so plans don't grow exponentially. Dedup
clusters are near-cliques (tiny diameter), so this converges in 2-3
rounds in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import materialize


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, component) with component = min node id reachable.

    ``nodes``: one column ``id_col`` (all ids, including isolated ones —
    they come back as singleton components). ``pairs``: columns
    (id_a, id_b), undirected.

    ``num_partitions`` sizes every round's shuffle: the per-round cost
    has a fixed term ∝ partitions × rounds (task launch, checkpoint
    blocks), so size it to the GRAPH, not the cluster default — a few
    for thousands of nodes, thousands for billions. None keeps the
    session default (AQE still coalesces the joins, but checkpointed
    round outputs keep their width).
    """
    edges = (
        pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .unionByName(pairs.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
    )
    labels = nodes.select(F.col(id_col).alias("n"), F.col(id_col).alias("l"))
    if num_partitions is not None:
        edges = edges.repartition(num_partitions, "s")
        labels = labels.repartition(num_partitions, "n")
    edges = edges.transform(materialize)
    labels = labels.transform(materialize)
    prev_sum = labels.agg(F.sum("l")).collect()[0][0]

    for _ in range(max_iter):
        msgs = edges.join(labels, edges["s"] == labels["n"]).select(
            F.col("d").alias("n"), F.col("l")
        )
        merged = labels.unionByName(msgs).groupBy("n").agg(F.min("l").alias("l"))
        if num_partitions is not None:
            merged = merged.coalesce(num_partitions)
        # per-iteration truncation, not fault tolerance: force the
        # local form even when the session has a checkpoint dir
        # (reliable files are never auto-deleted; see session.materialize)
        labels = merged.transform(lambda d: materialize(d, reliable=False))
        cur_sum = labels.agg(F.sum("l")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.select(F.col("n").alias(id_col), F.col("l").alias("component"))


def dedup_keep_component_min(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every row whose id is not its component's representative
    (the min id). The transitive upgrade of greedy keep-min-id."""
    comp = connected_components(df.select(id_col), pairs, id_col=id_col)
    keep = comp.where(F.col(id_col) == F.col("component")).select(id_col)
    return df.join(keep, id_col, "left_semi")
