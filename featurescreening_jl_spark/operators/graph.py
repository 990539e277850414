"""Connected components over candidate-pair graphs.

The missing piece between pairwise near-dup detection and corpus dedup:
``minhash_lsh_pairs`` emits PAIRS, but duplicates form chains/clusters
(A~B, B~C with A≁C). Greedy pair-loser dropping keeps two of three docs
in a chain; correct dedup keeps exactly one representative per CONNECTED
COMPONENT of the pair graph.

Implementation: distributed min-label propagation — every node starts
labeled with its own id; each round every node takes the min label in its
neighborhood; converged when no label changes. Each round is one
join + one groupBy (both shuffles on the node id, broadcast-eligible when
the frontier shrinks), with ``localCheckpoint`` truncating the plan
lineage so round N's plan does not re-derive rounds 1..N-1.

Scale notes (the 100 TB story): rounds needed = graph diameter. Near-dup
graphs are unions of near-cliques (every member of a dup cluster pairs
with most others), so diameters are tiny (2-4) in practice — the
pathological long-chain case is bounded by ``max_iterations``. The
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") converges in O(log n) rounds
independent of diameter and is the drop-in upgrade if chains ever matter;
per-round cost is the same shape (self-join + min-aggregate).

Reference parity note: the reference engine has no graph operator — this
is part of the graft's training-data-pipeline layer (SURVEY.md §2 LLM
ops), required for correct transitive dedup at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the MINIMUM node
    id reachable from it (= a canonical component representative).

    Returns ``(id, component)`` — one row per node that appears in any
    pair. ``component == id`` exactly for the representative (minimum)
    node of each component.

    Raises if ``max_iterations`` rounds don't converge (diameter larger
    than expected — raise the cap or switch to large-star/small-star).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )

    # Convergence detector: labels only ever DECREASE (min-propagation), so
    # the label sum strictly decreases until the fixpoint — comparing sums
    # needs one aggregate per round instead of a full old-vs-new join.
    # decimal(38,0): id sums overflow int64 at corpus scale.
    def label_sum(lb) -> int:
        s = lb.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        return int(s) if s is not None else 0  # None ⇔ empty graph

    prev_sum = label_sum(labels)
    for _ in range(max_iterations):
        # min label over each node's neighborhood (one hop)
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("__ncomp"))
        )
        new_labels = (
            labels.join(neigh, labels.id == neigh.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__ncomp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage: round N doesn't replan 1..N-1
        )
        cur_sum = label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            edges.unpersist()
            return labels
        prev_sum = cur_sum
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )
