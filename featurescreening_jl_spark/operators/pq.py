"""Product quantization (PQ) for embedding compression + ADC search.

The third ANN scale path next to sign-LSH (``operators/similarity.py``)
and IVF (``operators/ivf.py``) — and the one that changes the STORAGE
story: a ``dim``-float embedding (256 B at dim=64/fp32) compresses to
``m`` uint8 codes (8 B at m=8), so a 10^12-vector corpus's search
structure drops from ~250 TB to ~8 TB and candidate scoring stops being
memory-bandwidth-bound. This is the FAISS ``IndexPQ`` /
``IndexIVFPQ``-residual-free design re-expressed as DataFrame ops.

Build/query split mirrors :mod:`ivf`:

- ``train_pq``  — ONE bounded Spark job (the same deterministic
  hash-ordered sample as ``train_centroids``) → driver-side numpy:
  vectors are unit-normalized, split into ``m`` contiguous subspaces,
  and each subspace gets its own seeded Lloyd k-means codebook of
  ``ksub`` centroids. Codebooks are (m, ksub, dsub) float64 — a few KB,
  a broadcast literal thereafter.
- ``pq_encode`` — adds ``code``: array<int> of per-subspace nearest-
  centroid ids, as ``m`` pure argmin expressions over one codebook
  literal each. No UDF, no shuffle, no action; at scale the coded
  corpus is written once and the float vectors never need to be read
  again for candidate generation.
- ``pq_topk``   — asymmetric distance computation (ADC): each QUERY
  builds a (m × ksub) lookup table of exact dot products between its
  unit-normalized subvectors and every codebook centroid (one nested-HOF
  expression over the codebook literal — queries are few); the coded
  corpus is then scored with ``m`` array lookups + a sum per row — no
  floating-point vector math touches the corpus side at all. Top-k per
  query is a window (WindowGroupLimit).

Accuracy contract: scores approximate the true cosine with error bounded
by the per-subspace quantization error (unit-norm vectors ⇒
``|adc − cos| ≤ Σ_j ‖q_j‖·‖x_j − c(x_j)‖``). Rankings are exact whenever
true-score gaps exceed that bound — the driver query synthesizes such a
neighborhood (the ``q_ivf_topk`` pattern) so its oracle can demand
EXACT rank equality; probabilistic recall on generic data is asserted in
``tests/test_pq.py``.

Reference scope note: FeatureScreening.jl has no ANN operator — this is
the LLM-training-data graft layer, not reference parity.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurescreening_jl_spark.functions.vector import (
    double_array_literal,
    unit,
)
from featurescreening_jl_spark.operators.similarity import _require_dim

__all__ = [
    "train_pq",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "random_codebooks",
]


def random_codebooks(
    m: int, ksub: int, dsub: int, seed: int = 17
) -> np.ndarray:
    """Seeded Gaussian codebooks, (m, ksub, dsub), scaled to the typical
    subvector norm of a unit vector split m ways (1/√(m·dsub) per
    coordinate). NOT a trained quantizer — recall is whatever random
    Voronoi cells give you. Exists so the full encode+ADC machinery can
    be replayed by an external engine from just (m, ksub, dsub, seed):
    the driver oracle rebuilds these exact literals (the
    ``project_embeddings`` pattern) and checks codes, scores, and ranks
    end-to-end. Production uses :func:`train_pq`.
    """
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, ksub, dsub)) / np.sqrt(m * dsub)


def _unit_rows(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return X / norms


def train_pq(
    corpus: DataFrame,
    m: int,
    ksub: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
    max_train_rows: int = 100_000,
    n_iter: int = 10,
) -> np.ndarray:
    """Per-subspace k-means codebooks, (m, ksub, dim//m) float64.

    Trained on UNIT-NORMALIZED vectors (PQ here approximates cosine, so
    the stored quantity is the direction); subspaces are contiguous dim
    slices. Deterministic for the same reasons as
    ``ivf.train_centroids``: hash-ordered bounded sample, seeded numpy
    Lloyd iterations, empty-cluster re-seed from the same RNG stream.
    """
    _require_dim(dim, "train_pq")
    if dim % m != 0:
        raise ValueError(f"train_pq: dim={dim} not divisible by m={m}")
    dsub = dim // m
    sample = (
        corpus.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(max_train_rows)
        .toPandas()
    )
    X = _unit_rows(np.array(sample["v"].tolist(), dtype=np.float64))
    if X.shape[0] < ksub:
        raise ValueError(
            f"train_pq: corpus has {X.shape[0]} rows < ksub={ksub}"
        )
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(S.shape[0], ksub, replace=False)]
        for _ in range(n_iter):
            # L2 argmin == argmax(dot − ½‖c‖²); vectorized assignment
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = S[assign == c]
                if members.shape[0] == 0:
                    cents[c] = S[rng.integers(0, S.shape[0])]
                else:
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    code_col: str = "code",
) -> DataFrame:
    """Add ``code_col``: array<int> of length m — per-subspace id of the
    L2-nearest codebook centroid of the UNIT-NORMALIZED vector.

    Pure expressions: per subspace, argmin ‖x_j − c‖² == argmax
    (dot(x_j, c) − ½‖c‖²), with the same first-max/array_position
    tie-break as ``ivf.assign_cells``. The whole code array is ONE
    nested HOF walk over a single (m × ksub × dsub) codebook literal —
    not m unrolled per-subspace subtrees: the unrolled form built an
    expression tree ~m× larger, and plan analysis + codegen JIT of that
    tree dominated single-shot latency (measured ~8 s cold at sf0.1;
    the fused walk compiles once and small). No UDF, no shuffle, no
    action — at scale, encode once and write the (id, code) table; it
    is ~30× narrower than the float corpus.
    """
    m, ksub, dsub = codebooks.shape
    lit3 = double_array_literal(codebooks.tolist())
    half2 = double_array_literal(
        (0.5 * (codebooks**2).sum(axis=2)).tolist()
    )
    uvec = unit(F.col(vec_col))

    def code_of(uv):
        # uv bound once per row. Per subspace j: slice once (struct-
        # bound), adjusted dots once (struct-bound), then the argmax —
        # nothing expensive sits inside a lambda that re-evaluates it.
        meta = F.zip_with(
            F.zip_with(
                lit3, half2, lambda b, h: F.struct(b.alias("b"), h.alias("h"))
            ),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda bh, j: F.struct(
                bh["b"].alias("b"), bh["h"].alias("h"), j.alias("j")
            ),
        )

        def sub_code(bhj):
            bound = F.struct(
                F.slice(uv, bhj["j"] * dsub + 1, dsub).alias("sub"),
                bhj["b"].alias("b"),
                bhj["h"].alias("h"),
            )

            def argmax_adj(s):
                dots = F.zip_with(
                    F.transform(
                        s["b"],
                        lambda c: F.aggregate(
                            F.zip_with(s["sub"], c, lambda x, y: x * y),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        ),
                    ),
                    s["h"],
                    lambda d, h: d - h,
                )
                return F.element_at(
                    F.transform(
                        F.array(dots),
                        lambda dd: (
                            F.array_position(dd, F.array_max(dd)) - 1
                        ).cast("int"),
                    ),
                    1,
                )

            return F.element_at(F.transform(F.array(bound), argmax_adj), 1)

        return F.transform(meta, sub_code)

    code = F.element_at(F.transform(F.array(uvec), code_of), 1)
    return df.withColumn(code_col, code)


def pq_topk(
    coded_corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    code_col: str = "code",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k by asymmetric distance computation.

    Each query row computes its (m × ksub) dot-product lookup table
    against the codebook literal ONCE (queries are few — this rides the
    broadcast); corpus rows are scored as ``Σ_j lut[j][code[j]]`` — m
    integer array lookups and adds per row, zero float vector math on
    the corpus side. Scores are the exact cosine between the query and
    each corpus vector's QUANTIZED unit direction.
    """
    m, ksub, dsub = codebooks.shape
    lit3 = double_array_literal(codebooks.tolist())
    qunit = unit(F.col(vec_col))

    def lut_of(uq):
        return F.transform(
            F.zip_with(
                lit3,
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda book, j: F.struct(book.alias("b"), j.alias("j")),
            ),
            lambda bj: F.transform(
                bj["b"],
                lambda c: F.aggregate(
                    F.zip_with(
                        F.slice(uq, bj["j"] * dsub + 1, dsub),
                        c,
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            ),
        )

    q = queries.select(
        query_id_col,
        F.element_at(F.transform(F.array(qunit), lut_of), 1).alias("__lut"),
    )
    scored = coded_corpus.select(id_col, code_col).crossJoin(
        F.broadcast(q)
    )
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.col("__lut"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc_score"), F.asc(id_col)
    )
    return (
        scored.withColumn("adc_score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_score", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "code",
    query_id_col: str = "query_id",
    n_probe: int = 4,
    assigned_cell_col: str | None = None,
) -> DataFrame:
    """IVF + PQ composed — the FAISS ``IndexIVFPQ`` shape (coarse Voronoi
    pruning from :mod:`ivf`, then ADC scoring over codes from this
    module): only the ``n_probe`` probed cells' CODE rows are scored, so
    per-query work is ``|corpus| · n_probe / n_cells`` array lookups and
    the float corpus is never read at query time.

    With ``n_probe == n_cells`` the result is IDENTICAL to
    :func:`pq_topk` (pytest-pinned) — probing only ever removes
    candidates, never reorders them, because both paths share the same
    ADC score and the same (score desc, id asc) tie-break.

    Pass ``assigned_cell_col`` when the corpus is already encoded AND
    cell-assigned (the written-once index table, ideally
    ``partitionBy(cell)`` so the probe equi-join prunes files); otherwise
    both the cell id and the code are computed here as pure expressions.
    """
    from featurescreening_jl_spark.operators.ivf import (
        _probe_cells,
        assign_cells,
    )

    m, ksub, dsub = codebooks.shape
    if assigned_cell_col is None:
        assigned = assign_cells(
            pq_encode(
                corpus.select(id_col, vec_col),
                codebooks,
                vec_col=vec_col,
                code_col=code_col,
            ),
            centroids,
            vec_col=vec_col,
        ).select(id_col, code_col, "cell")
        cell_col = "cell"
    else:
        assigned = corpus.select(id_col, code_col, assigned_cell_col)
        cell_col = assigned_cell_col

    lit3 = double_array_literal(codebooks.tolist())
    qunit = unit(F.col(vec_col))

    def lut_of(uq):
        return F.transform(
            F.zip_with(
                lit3,
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda book, j: F.struct(book.alias("b"), j.alias("j")),
            ),
            lambda bj: F.transform(
                bj["b"],
                lambda c: F.aggregate(
                    F.zip_with(
                        F.slice(uq, bj["j"] * dsub + 1, dsub),
                        c,
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            ),
        )

    q = queries.select(
        query_id_col,
        F.element_at(F.transform(F.array(qunit), lut_of), 1).alias("__lut"),
        F.explode(
            _probe_cells(F.col(vec_col), centroids, n_probe)
        ).alias(cell_col),
    )
    cand = assigned.join(F.broadcast(q), on=cell_col)
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.col("__lut"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc_score"), F.asc(id_col)
    )
    return (
        cand.withColumn("adc_score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_score", "rank")
    )
