"""Connected components over a similarity-edge list (dedup clustering).

Near-duplicate detection yields *pairs*; turning pairs into dedup
decisions needs the transitive closure — if A≈B and B≈C, then {A,B,C}
is one duplicate cluster and one canonical representative survives.
This module computes components with iterative min-label propagation
expressed entirely in DataFrame ops (join + groupBy per round), so it
scales horizontally: each round is two shuffles on the edge/label keys.

Convergence is O(graph diameter) rounds. Real near-dup graphs are
short-diameter (clusters of mutually-similar documents), so a handful
of rounds suffices; for adversarially long path graphs the
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) drops this to
O(log n) rounds with the same join/groupBy building blocks — noted
here as the upgrade path, not needed for dedup workloads.

Lineage control: each round ends in ``localCheckpoint(eager=True)`` —
without it the iterated self-referential plan grows exponentially and
the driver, not the data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``nodes``: one column ``id_col`` (all vertex ids, including
    singletons). ``edges``: columns ``src``/``dst``; treated as
    undirected. Returns (id_col, component_id) — component_id is the
    min id in the component, the conventional canonical-representative
    choice for dedup (keep the smallest/earliest id).
    """
    ue = edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    ue = ue.union(ue.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
    lbl = nodes.select(F.col(id_col).alias("_id"), F.col(id_col).alias("_lbl")).localCheckpoint()
    for _ in range(max_iter):
        prop = (
            ue.join(lbl, ue["_a"] == lbl["_id"])
            .select(F.col("_b").alias("_id"), F.col("_lbl"))
        )
        new = (
            lbl.union(prop)
            .groupBy("_id")
            .agg(F.min("_lbl").alias("_lbl"))
            .localCheckpoint()  # truncate iterated lineage
        )
        changed = (
            new.alias("n")
            .join(lbl.alias("o"), F.col("n._id") == F.col("o._id"))
            .filter(F.col("n._lbl") != F.col("o._lbl"))
            .limit(1)
            .count()
        )
        lbl = new
        if changed == 0:
            break
    return lbl.select(F.col("_id").alias(id_col), F.col("_lbl").alias("component_id"))
