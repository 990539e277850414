"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding similarity next to ``lsh_topk``
(``operators/similarity.py``): partition the corpus into ``n_cells``
Voronoi cells around spherical-k-means centroids, then score each query
only against the ``n_probe`` cells whose centroids are closest to it —
the FAISS ``IndexIVFFlat`` design re-expressed as DataFrame ops.

Build/query split mirrors every real ANN system:

- ``train_centroids``  — ONE bounded Spark job (deterministic hash-ordered
  sample -> driver-side numpy spherical k-means). At 10^12 vectors the
  sample stays ``max_train_rows`` no matter the corpus size; k-means over
  ~100k × dim floats is sub-second on the driver. This is an index BUILD
  (an action by design), not plan construction — callers trigger it
  explicitly, never as a hidden side effect of composing a plan.
- ``assign_cells``     — adds the cell id as ONE codegen expression
  (argmax of dot products against a centroid literal); no UDF, no shuffle.
  At scale the assigned corpus is written ``partitionBy("cell")`` (or
  bucketed on it) once, so every later probe join prunes to the probed
  cells' files — the inverted file.
- ``ivf_topk``         — queries pick their ``n_probe`` nearest cells
  (again one expression), explode to (query, cell) keys, broadcast-join
  against the assigned corpus on ``cell``, exact-rescore inside the probed
  cells, TopK per query. The corpus is filtered by cell BEFORE any dot
  product runs; with a cell-partitioned corpus the scan itself prunes.

Scaling: work per query is |corpus| * n_probe / n_cells instead of
|corpus|; recall is tuned by n_probe (n_probe = n_cells degrades to exact
brute force). Probabilistic recall is asserted in tests; the driver query
synthesizes provably-retrievable neighborhoods (see ``__spark_entry__``).

Reference scope note: FeatureScreening.jl has no ANN operator — this is
part of the LLM-training-data graft layer, not reference parity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurescreening_jl_spark.functions.vector import cosine, double_array_literal
from featurescreening_jl_spark.operators.similarity import _require_dim

__all__ = ["train_centroids", "assign_cells", "ivf_topk"]


def train_centroids(
    corpus: DataFrame,
    n_cells: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train_rows: int = 100_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Spherical k-means centroids, (n_cells, dim) float64, unit-norm rows.

    Deterministic: the training sample is the ``max_train_rows`` corpus
    rows with the smallest ``xxhash64(id)`` (a seedless uniform sample
    that is stable across partitioning and cluster size — TakeOrdered,
    no full sort), and the numpy Lloyd iterations are seeded. Runs one
    bounded Spark job; see the module docstring for why an index build
    is an action on purpose.
    """
    sample = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(max_train_rows)
        .toPandas()
    )
    X = np.array(sample["v"].tolist(), dtype=np.float64)
    if X.shape[0] < n_cells:
        raise ValueError(
            f"train_centroids: corpus has {X.shape[0]} rows < "
            f"n_cells={n_cells}"
        )
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    Xn = X / norms

    rng = np.random.default_rng(seed)
    centroids = Xn[rng.choice(Xn.shape[0], n_cells, replace=False)]
    for _ in range(n_iter):
        # assign: argmax cosine == argmax dot (both sides unit-norm)
        cells = np.argmax(Xn @ centroids.T, axis=1)
        for c in range(n_cells):
            members = Xn[cells == c]
            if members.shape[0] == 0:
                # re-seed empty cell from a (seeded-)random sample point
                centroids[c] = Xn[rng.integers(0, Xn.shape[0])]
                continue
            m = members.mean(axis=0)
            n = np.linalg.norm(m)
            centroids[c] = m / n if n > 0 else centroids[c]
    return centroids


def _centroid_dots(vec_col, centroids: np.ndarray):
    """array<double> of dot(vec, centroid_c) for every cell c — one 2-D
    literal (n_cells × dim) walked with higher-order functions, one plan
    node total (the ``_table_buckets`` lesson: per-centroid expression
    trees blow up Catalyst analysis)."""
    lit = double_array_literal(centroids.tolist())
    return F.transform(
        lit,
        lambda c: F.aggregate(
            F.zip_with(vec_col, c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Add ``cell_col``: the index of the max-dot centroid (centroids are
    unit-norm, so argmax dot == argmax cosine; the vector's own norm is
    cell-invariant). First-max tie-break via ``array_position`` —
    deterministic. Pure expression: no UDF, no shuffle, no action."""
    dots = _centroid_dots(F.col(vec_col), centroids)

    def argmax_cell(d):
        # d is a LAMBDA VARIABLE (array(dots) binding): inlining `dots`
        # twice (array_position + array_max) would evaluate the full
        # k_cells × dim dot-product array TWICE per row.
        return (F.array_position(d, F.array_max(d)) - 1).cast("int")

    cell = F.element_at(F.transform(F.array(dots), argmax_cell), 1)
    return df.withColumn(cell_col, cell)


def _probe_cells(vec_col, centroids: np.ndarray, n_probe: int):
    """array<int> of the n_probe nearest cell ids for a query vector —
    sort (−dot, cell) structs, deterministic on dot ties by cell asc."""
    n_cells = centroids.shape[0]
    dots = _centroid_dots(vec_col, centroids)
    ranked = F.array_sort(
        F.zip_with(
            dots,
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda d, i: F.struct((-d).alias("nd"), i.alias("cell")),
        )
    )
    return F.slice(
        F.transform(ranked, lambda s: s["cell"].cast("int")), 1, n_probe
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    centroids: np.ndarray | None = None,
    n_cells: int = 64,
    n_probe: int = 4,
    seed: int = 42,
    assigned_cell_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF probing.

    Pass ``centroids`` from :func:`train_centroids` (the build/query
    split); if omitted they are trained here — a Spark job at call time,
    acceptable for one-shot use, wasteful in a loop. If the corpus was
    pre-assigned (``assign_cells`` + written ``partitionBy(cell)``), pass
    ``assigned_cell_col`` so the probe filter prunes partitions instead
    of recomputing assignments.
    """
    _require_dim(dim, "ivf_topk")
    if centroids is None:
        centroids = train_centroids(
            corpus, n_cells, id_col=id_col, vec_col=vec_col, seed=seed
        )
    if assigned_cell_col is None:
        assigned = assign_cells(
            corpus.select(id_col, vec_col), centroids, vec_col=vec_col
        )
        cell_col = "cell"
    else:
        assigned = corpus.select(id_col, vec_col, assigned_cell_col)
        cell_col = assigned_cell_col

    q_probes = queries.select(
        query_id_col,
        F.col(vec_col).alias("__qvec"),
        F.explode(
            _probe_cells(F.col(vec_col), centroids, n_probe)
        ).alias(cell_col),
    )
    # queries × n_probe is small → broadcast; the corpus side only ever
    # sees an equi-join filter on its cell column (partition-prunable).
    cand = assigned.join(F.broadcast(q_probes), on=cell_col).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("similarity"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("similarity"), F.asc(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "similarity", "rank")
    )
