"""Connected components over an edge list — the clustering step that
turns near-duplicate *pairs* into dedup *groups* (every doc in a group
keeps/drops together; the canonical representative is the min id).

Iterative min-label propagation, the classic Spark shape for this:
each round joins current labels across edges and keeps the per-node min;
convergence in O(component diameter) rounds.  Near-dup graphs have tiny,
shallow components, so 3-4 rounds settle real corpora.

Scale notes: lineage is truncated every round with an eager
``localCheckpoint`` — without it the plan doubles per iteration and
Catalyst optimization time explodes (on a cluster with an HDFS
checkpoint dir, swap in ``checkpoint``).  The convergence check is one
tiny count per round, far cheaper than a wasted extra round at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "i",
    dst: str = "j",
    max_iters: int = 20,
) -> DataFrame:
    """Label every node of the undirected ``edges`` graph with its
    component's minimum node id.  Returns (node, cluster_id); nodes with
    no edges are not in the output (callers union singletons if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )

    def label_mass(df: DataFrame):
        # labels only ever DECREASE under min-propagation, so the total
        # label mass is a strictly-monotone convergence signal: unchanged
        # mass == unchanged labels.  One scan over the already-checkpointed
        # partitions — much cheaper than the old per-round change-join.
        # decimal(38,0): sums of 2^63-scale ids cannot overflow.
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev_mass = None
    converged = False
    for _ in range(max_iters):
        nbr = sym.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        mass = label_mass(labels)
        if mass == prev_mass:
            converged = True
            break
        prev_mass = mass
    if not converged:
        # returning unconverged labels would be SILENTLY wrong output
        # (nodes of one component under different labels) — fail loudly;
        # callers with genuinely deep graphs raise max_iters
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "a component's diameter exceeds max_iters — raise max_iters"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))
