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

Scale notes (the 100 TB story): plain min-label needs one round per hop
(rounds = graph diameter). Both variants here are O(log)-round: min-label
carries a pointer-jumping shortcut (``component := label[component]``
each round, halving remaining path length — O(log diameter) rounds), and
``algorithm="star"`` runs the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014),
O(log n) rounds independent of diameter with per-round cost of the same
shape (self-join + min-aggregate). Near-dup graphs are unions of
near-cliques (diameter 2-4), so either converges in a handful of rounds;
``max_iterations`` bounds the pathological case.

Reference parity note: the reference engine has no graph operator — this
is part of the graft's training-data-pipeline layer (SURVEY.md §2 LLM
ops), required for correct transitive dedup at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank", "propagate_labels"]

# per-round task sizing: ~1M (long, long) edge rows ≈ 16 MB per partition.
# Iterative CC runs MANY small jobs (one per round); on a tiny pair graph
# (near-dup graphs at moderate SF are a few hundred edges) keeping the
# checkpointed edge table at cluster-default partitioning makes every
# round pay 32+ near-empty task launches per stage — measured ~0.4-0.5 s
# of pure scheduling per round at sf0.1. Coalescing DOWN to the data size
# (never up) removes that floor; at 100 TB the edge table is billions of
# rows and keeps its parent partitioning untouched.
_EDGE_ROWS_PER_PARTITION = 1_000_000


def _coalesce_small(df: DataFrame, n_rows: int) -> DataFrame:
    """Coalesce a checkpointed edge/label table down to ``ceil(n_rows /
    1M)`` partitions when that is fewer than it currently has (narrow —
    no shuffle; reads the existing checkpoint blocks)."""
    cur = df.rdd.getNumPartitions()
    p = max(1, -(-n_rows // _EDGE_ROWS_PER_PARTITION))
    return df.coalesce(p) if p < cur else df


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iterations: int = 25,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Label every node of the undirected pair graph with the MINIMUM node
    id reachable from it (= a canonical component representative).

    Returns ``(id, component)`` — one row per node that appears in any
    pair. ``component == id`` exactly for the representative (minimum)
    node of each component.

    ``algorithm="minlabel"`` (default): frontier min-label propagation
    with a pointer-jumping shortcut — O(log diameter) rounds.
    ``algorithm="star"``: alternating large-star/small-star — O(log n)
    rounds independent of diameter.

    Raises if ``max_iterations`` rounds don't converge.
    """
    if algorithm == "star":
        return _cc_star(pairs, id_a, id_b, max_iterations=max_iterations)
    if algorithm != "minlabel":
        raise ValueError(
            f"unknown algorithm {algorithm!r} (expected 'minlabel' or 'star')"
        )
    # EAGER localCheckpoint, not lazy persist: the round-0 job references
    # edges from several parallel branches (frontier, neigh, labels), and
    # a lazily-persisted plan gets CONCURRENTLY recomputed by each branch
    # before the cache populates — for an expensive upstream pair graph
    # (LSH join, indexed jaccard) that multiplied the dominant cost ~4×.
    # Materializing once up front computes the pair graph exactly once;
    # checkpoint storage is RDD-level, so it is ContextCleaner-collected
    # when the result DataFrame is dropped (no cache-manager leak).
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    # one cheap job on the checkpointed table buys right-sized rounds
    edges = _coalesce_small(edges, edges.count())
    # frontier-only propagation: a node re-broadcasts its label ONLY in the
    # round after it improved (__chg). Min-label is monotone — every
    # improvement is broadcast exactly once, so neighbors never miss a
    # value — and the expensive edges⋈labels join shrinks with the
    # frontier (near-clique dup graphs: round 2+ frontiers are tiny).
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"), F.lit(True).alias("__chg"))
    )
    for _ in range(max_iterations):
        # messages from last round's improvers only (round 1: everyone)
        frontier = labels.where(F.col("__chg"))
        neigh = (
            edges.join(frontier, edges.src == frontier.id)
            .groupBy("dst")
            .agg(F.min("component").alias("__ncomp"))
        )
        hop = labels.join(neigh, labels.id == neigh.dst, "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("__ncomp"), F.col("component")),
            ).alias("component"),
        )
        # pointer-jumping shortcut: adopt the current representative's own
        # label (component := label[component]). Every component value is a
        # node id present in labels, so the join always matches. This halves
        # the remaining path length each round — convergence O(log diameter)
        # instead of O(diameter), which is what makes min-label viable on
        # chain-shaped dup graphs, not just near-cliques.
        reps = hop.select(
            F.col("id").alias("__rid"), F.col("component").alias("__rcomp")
        )
        new_labels = (
            hop.join(reps, hop.component == reps.__rid, "left")
            .join(
                labels.select("id", F.col("component").alias("__old")),
                "id",
            )
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__rcomp"), F.col("component")),
                ).alias("component"),
                (
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("__rcomp"), F.col("component")),
                    )
                    < F.col("__old")
                ).alias("__chg"),
            )
            # lazy: the convergence count below is the ONE action per round
            # and materializes this checkpoint as its side effect (the old
            # eager checkpoint + separate sum-compare ran two jobs/round).
            # Lineage still truncates: round N doesn't replan rounds 1..N-1.
            .localCheckpoint(eager=False)
        )
        n_changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels
        if n_changed == 0:
            return labels.select("id", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def _cc_star(
    pairs: DataFrame, id_a: str, id_b: str, *, max_iterations: int
) -> DataFrame:
    """Alternating large-star/small-star (Kiveris et al. 2014): O(log n)
    rounds independent of graph diameter — the long-chain scale path.

    Edges are kept CANONICAL (``u > v``). Each round:

    large-star — for every node u with min-reachable candidate
    ``m = min(N(u) ∪ {u})``, connect u's strictly LARGER neighbors to m
    (``{(v, m) : v ∈ N(u), v > u}``; m ≤ u < v keeps edges canonical).

    small-star — for every node u (neighbors now all smaller) with
    ``m = min(N(u))``, connect its other neighbors and itself to m
    (``{(v, m) : v ∈ N(u), v ≠ m} ∪ {(u, m)}``).

    Both steps are one hash-agg (per-node min) + one join — no
    ``collect_set`` neighborhood materialization, so a hot node never
    builds a giant array. Fixpoint = disjoint union of stars centered at
    component minima; detected by a (count, hash-sum) checksum of the
    canonical edge set (one tiny aggregate per round).
    ``localCheckpoint`` truncates lineage so round N does not replan
    rounds 1..N-1.
    """
    # ONE checkpointed canonical table feeds BOTH the edge rounds and the
    # final node roster. Deriving `nodes` from the raw `pairs` plan (the
    # round-3 shape) made every downstream action on the RESULT re-run the
    # entire upstream pair pipeline (LSH join / indexed jaccard) just to
    # list node ids — measured as the dominant cost of
    # keep_best_per_cluster at sf0.1. Self-pairs (u == v) stay in `canon`
    # so a node appearing only in a self-pair still gets a label; they are
    # filtered from the star rounds, which need real edges.
    canon = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .distinct()
        .localCheckpoint()
    )
    edges = canon.where(F.col("u") != F.col("v"))

    def checksum(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
        ).first()
        return (row["n"], int(row["s"]) if row["s"] is not None else 0)

    prev = checksum(edges)
    # the checksum's count doubles as the partition-sizing probe
    canon = _coalesce_small(canon, prev[0])
    edges = canon.where(F.col("u") != F.col("v"))
    nodes = (
        canon.select(F.col("u").alias("id"))
        .unionAll(canon.select(F.col("v").alias("id")))
        .distinct()
    )
    converged = False
    for _ in range(max_iterations):
        # ---- large-star ----
        both = edges.unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = both.groupBy("u").agg(F.min("v").alias("__mn"))
        ls = (
            both.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("__mn"), F.col("u")).alias("v"),
            )
            .distinct()
        )
        # ---- small-star (ls edges are canonical: all neighbors of u < u)
        mins2 = ls.groupBy("u").agg(F.min("v").alias("__m"))
        new_edges = (
            ls.join(mins2, "u")
            .where(F.col("v") != F.col("__m"))
            .select(F.col("v").alias("u"), F.col("__m").alias("v"))
            .unionAll(mins2.select("u", F.col("__m").alias("v")))
            .distinct()
            # lazy: the checksum aggregate below is the one action per
            # round and persists this checkpoint as its side effect
            .localCheckpoint(eager=False)
        )
        cur = checksum(new_edges)
        edges = new_edges
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in "
            f"{max_iterations} rounds"
        )
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return nodes.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    damping: float = 0.85,
    iterations: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over a directed edge list —
    the web-graph quality signal LLM-corpus curation ranks domains with
    (the CommonCrawl/CCNet lineage uses link-centrality to prioritize
    crawl sources; Page et al. 1999 for the recurrence).

    Returns ``(node, rank)`` for every node appearing as src or dst.
    Uses the ORIGINAL simplified recurrence — no dangling-mass
    redistribution::

        rank_0(v)   = 1 / N
        rank_k+1(v) = (1-d)/N + d * sum_{(u,v) in E} rank_k(u) * w(u,v) / out_w(u)

    which makes every iteration a pure join + groupBy and keeps the
    recurrence exactly replayable in ANSI SQL (the oracle unrolls the
    ``iterations`` steps as stacked CTEs — convergence-tested variants
    can't be value-checked). ``weight=None`` counts parallel edges as
    weight 1 each.

    Scale shape: the edge table is shaped ONCE — out-strength joined in,
    pre-partitioned by ``src``, eagerly localCheckpointed — so each of
    the K iterations shuffles only the rank table (|nodes| rows, two
    narrow columns): once to co-locate with edges on src, once for the
    groupBy(dst). Edges (the 100 TB side) never re-shuffle after round
    0. The per-iteration full-outer alignment against the node list is
    a |nodes|-sized join, never |edges|.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    sc = edges.sparkSession.sparkContext
    P = partitions or sc.defaultParallelism

    e = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), w.alias("__w")
    )
    out_w = e.groupBy("__src").agg(F.sum("__w").alias("__out_w"))
    # one-time edge shaping: contribution fraction baked in, partitioned
    # by the per-iteration join key. Eager checkpoint: K iterations each
    # reference this table; without materialization every iteration
    # replays the upstream scan+join.
    norm_edges = (
        e.join(out_w, "__src")
        .select("__src", "__dst", (F.col("__w") / F.col("__out_w")).alias("__frac"))
        .repartition(P, "__src")
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .repartition(P, "node")
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contribs = (
            norm_edges.join(
                ranks.withColumnRenamed("node", "__src"), "__src"
            )
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__frac")).alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("__in", F.lit(0.0))
                ).alias("rank"),
            )
            # truncate lineage per round (the CC lesson: round K's plan
            # must not re-derive rounds 1..K-1); lazy — the next round's
            # join materializes it once
            .localCheckpoint(eager=False)
        )
    return ranks


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised majority-vote label propagation with clamped
    seeds — spread trusted node labels (quality/spam verdicts, language
    tags, license classes) through a similarity or navigation graph:
    each round, every UNSEEDED node takes the modal label of its
    currently-labeled neighbors (ties: smaller label string — a
    deterministic mode); seed nodes are FROZEN (ground truth is never
    outvoted — the standard clamping that keeps LPA from washing out
    its supervision). Nodes with no labeled neighbor stay unlabeled
    until a later round reaches them.

    ``edges`` is treated as undirected: symmetrized then deduplicated
    internally, so parallel and reciprocal directed edges collapse to
    one adjacency and can never double-count a vote.

    Scale shape: fixed ``rounds`` iterations; each is one
    edge-keyed join against the current (node, label) table + one
    (node, label) count aggregate (map-side combined) + one min-of-struct
    argmax per node — per-round shuffle volume is bounded by the edge
    count, labels stay node-sized, nothing is collected. The mode's
    (count desc, label asc) tie-break is a single ``min(struct(-cnt,
    label))`` hash aggregate, not a window sort. All-integer/string
    arithmetic — a fixed-round SQL replay matches exactly.

    Output: ``(id_col, label_col, is_seed)`` for every node that has a
    label after ``rounds`` rounds.
    """
    fwd = edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
    rev = edges.select(F.col(dst_col).alias("__s"), F.col(src_col).alias("__d"))
    # distinct AFTER symmetrizing: a reciprocal directed pair (a→b, b→a)
    # must collapse to one undirected adjacency, or b would vote twice
    # for a. One bounded one-time shuffle of the edge table.
    sym = fwd.unionByName(rev).where(F.col("__s") != F.col("__d")).distinct()
    frozen = seeds.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lab")
    )
    cur = frozen
    for _ in range(rounds):
        votes = (
            sym.join(cur, sym["__d"] == cur["__id"])
            .groupBy("__s", "__lab")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        mode = (
            votes.groupBy("__s")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__cnt")).alias("nc"),
                        F.col("__lab").alias("lab"),
                    )
                ).alias("__m")
            )
            .select(
                F.col("__s").alias("__id"), F.col("__m.lab").alias("__lab")
            )
        )
        cur = frozen.unionByName(
            mode.join(frozen.select("__id"), "__id", "left_anti")
        )
    return (
        cur.join(
            frozen.select("__id", F.lit(True).alias("is_seed")),
            "__id",
            "left",
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__lab").alias(label_col),
            F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
        )
    )
