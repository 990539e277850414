"""Filter-method feature screening statistics.

The reference screens features by an EMBEDDED criterion — random-forest
split counts (`src/importance.jl:42-94`), wrapped by the tournament loop
(`src/FeatureScreening.jl:124-178`). This module adds the classic FILTER
criteria that production screening pipelines run before (or instead of)
a model fit, because they cost one or two scans instead of a forest per
round:

- :func:`chi2_mi_ranking` — per-feature chi-square statistic and mutual
  information against a categorical label, over equi-width bins.
- :func:`feature_corr_pairs` — the exact Pearson correlation matrix of a
  bounded feature list, as pair rows, from ONE aggregate pass.
- :func:`redundancy_prune` — greedy mRMR-lite: walk a ranked feature
  list, drop any feature too correlated with an already-kept one.

Cross-engine determinism: every statistic is derived from EXACT integer /
decimal sufficient statistics (bin counts; fixed-point feature sums), so
a SQL oracle replaying the same formulas reproduces the doubles
bit-for-bit — same design as ``window_features.expanding_zscore``.

100 TB notes: both rankers collapse the corpus in one map-side-combined
aggregate — chi2/MI to ``|features|·(n_bins+2)·|labels|`` contingency
rows, the correlation matrix to ONE row of ``O(k²)`` sums (k = number of
screened features, bounded by the screening step size, not the corpus).
Nothing downstream of the aggregate sees more than that. The binning
bounds ride a broadcast single-row subplan, so the corpus is scanned
exactly twice for chi2/MI (bounds, then counts) and once for
correlations; no corpus-sized shuffle anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chi2_mi_ranking",
    "feature_corr_pairs",
    "redundancy_prune",
]

# fixed-point sums: DECIMAL(38,0) addition is exact and associative, so
# partial (map-side) aggregation cannot perturb the result — unlike
# double sums, whose value depends on partitioning
_DEC = "decimal(38,0)"


def chi2_mi_ranking(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    n_bins: int = 8,
) -> DataFrame:
    """Rank features by chi-square and mutual information vs a label.

    Each feature is discretized into ``n_bins`` equi-width bins between
    its own min and max (NULL values form their own bin ``-1``; a
    constant feature collapses to bin ``0``), then tested against the
    categorical label on the resulting contingency table:

    - ``chi2``  = Σ_cells (O − E)² / E  with  E = row_tot·col_tot / N,
      summed over ALL cells (absent observed cells contribute E — folded
      in via the identity Σ_all E = N, so only observed cells are ever
      materialized);
    - ``mi``    = Σ_observed (O/N)·ln(O·N / (row_tot·col_tot))  in nats.

    Output: one row per feature — ``(feature, chi2, mi)``, both rounded
    to 6 decimals, descending by ``chi2``.

    Plan shape: scan 1 aggregates per-feature min/max into ONE row
    (map-side combine) that cross-broadcasts back; scan 2 explodes each
    row into ``k`` (feature, bin, label) triples map-side and hash-
    aggregates them to the bounded contingency table. The chi2/MI sums
    are windows + a final ``k``-row aggregate over that tiny table. The
    corpus itself never shuffles.
    """
    feats = list(feature_cols)
    if not feats:
        raise ValueError("feature_cols must be non-empty")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in feats],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in feats],
    )

    def _bin(c: str):
        x = F.col(c).cast("double")
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        width_bin = F.least(
            F.lit(n_bins - 1),
            F.floor((x - mn) / (mx - mn) * n_bins),
        )
        return (
            F.when(x.isNull(), F.lit(-1))
            .when(mn == mx, F.lit(0))
            .otherwise(width_bin)
            .cast("int")
        )

    melted = (
        df.join(F.broadcast(bounds))
        .select(
            F.col(label_col).alias("__label"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("feature"), _bin(c).alias("bin")
                        )
                        for c in feats
                    ]
                )
            ).alias("__fb"),
        )
        .select("__fb.feature", "__fb.bin", "__label")
    )
    cont = melted.groupBy("feature", "bin", "__label").agg(
        F.count("*").alias("o")
    )
    wf = Window.partitionBy("feature")
    cell = (
        cont.withColumn("rt", F.sum("o").over(Window.partitionBy("feature", "bin")))
        .withColumn("ct", F.sum("o").over(Window.partitionBy("feature", "__label")))
        .withColumn("n", F.sum("o").over(wf))
        .withColumn("e", F.col("rt") * F.col("ct") / F.col("n"))
    )
    return (
        cell.groupBy("feature")
        .agg(
            F.round(
                F.first("n")
                + F.sum(
                    (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
                    - F.col("e")
                ),
                6,
            ).alias("chi2"),
            F.round(
                F.sum(
                    F.col("o")
                    / F.col("n")
                    * F.log(F.col("o") * F.col("n") / (F.col("rt") * F.col("ct")))
                ),
                6,
            ).alias("mi"),
        )
        .orderBy(F.desc("chi2"), "feature")
    )


def _fixed(c: str, scale: int):
    # portable fixed-point: floor(x·10^s + 0.5) has identical semantics in
    # Spark and DuckDB (no dependence on either engine's round() mode)
    return F.floor(F.col(c).cast("double") * F.lit(10**scale) + F.lit(0.5)).cast(
        _DEC
    )


def feature_corr_pairs(
    df: DataFrame,
    feature_cols: Sequence[str],
    scale: int = 3,
) -> DataFrame:
    """Exact Pearson correlation for every feature pair, in ONE pass.

    Features are snapped to fixed point (``floor(x·10^scale + 0.5)``) so
    all sufficient statistics — Σx, Σx², Σxy per pair — are EXACT
    decimal sums: the final correlation is then a pure function of
    integers, bit-reproducible across engines and partitionings (a
    ``corr()`` built-in would be float-order-dependent). Rows with a
    NULL in ANY listed feature are dropped (listwise deletion — the
    standard correlation-matrix contract). Zero-variance features yield
    NULL correlations rather than ±inf.

    Output: ``(feature_a, feature_b, corr)`` for the k·(k−1)/2 unordered
    pairs in ``feature_cols`` order, ``corr`` rounded to 6 decimals.

    Plan shape: one scan → one aggregate row holding ``O(k²)`` decimal
    sums (map-side partial combine; k is the screened-feature count, a
    few dozen) → a map-only explode of that single row into pair rows.
    Keep ``scale`` small enough that ``x·10^scale`` squared times the
    row count stays far below 10³⁸ (defaults give ~10²⁴ headroom at
    10^12 rows of magnitude-10⁴ features).
    """
    feats = list(feature_cols)
    if len(feats) < 2:
        raise ValueError("need at least two features")
    cond = F.col(feats[0]).isNotNull()
    for c in feats[1:]:
        cond = cond & F.col(c).isNotNull()
    clean = df.where(cond).select(
        *[_fixed(c, scale).alias(c) for c in feats]
    )
    pairs = [(a, b) for i, a in enumerate(feats) for b in feats[i + 1 :]]
    agg = clean.agg(
        F.count("*").cast(_DEC).alias("__n"),
        *[F.sum(F.col(c)).alias(f"__s_{c}") for c in feats],
        *[
            F.sum((F.col(c) * F.col(c)).cast(_DEC)).alias(f"__q_{c}")
            for c in feats
        ],
        *[
            F.sum((F.col(a) * F.col(b)).cast(_DEC)).alias(f"__p_{i}")
            for i, (a, b) in enumerate(pairs)
        ],
    )

    def _corr(i: int, a: str, b: str):
        n = F.col("__n").cast("double")
        sa, sb = (
            F.col(f"__s_{a}").cast("double"),
            F.col(f"__s_{b}").cast("double"),
        )
        qa, qb = (
            F.col(f"__q_{a}").cast("double"),
            F.col(f"__q_{b}").cast("double"),
        )
        p = F.col(f"__p_{i}").cast("double")
        va = n * qa - sa * sa
        vb = n * qb - sb * sb
        return F.when(
            (va > 0) & (vb > 0),
            F.round((n * p - sa * sb) / F.sqrt(va * vb), 6),
        )

    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("feature_a"),
                        F.lit(b).alias("feature_b"),
                        _corr(i, a, b).alias("corr"),
                    )
                    for i, (a, b) in enumerate(pairs)
                ]
            )
        ).alias("__p")
    ).select("__p.feature_a", "__p.feature_b", "__p.corr")


def redundancy_prune(
    ranked_features: Sequence[str],
    corr_pairs: DataFrame | Sequence[tuple],
    threshold: float = 0.9,
) -> list[str]:
    """Greedy mRMR-lite redundancy pruning over a ranked feature list.

    Walk ``ranked_features`` best-first; keep a feature unless its
    absolute correlation with an ALREADY-KEPT feature is ≥ ``threshold``
    (NULL correlations — zero-variance features — never block). The
    pair table is the bounded O(k²) output of
    :func:`feature_corr_pairs`; collecting it is driver-side metadata,
    same class as the reference's ranked name list
    (`src/importance.jl:136-153` keeps selection driver-resident too).

    Returns the kept features, rank order preserved.
    """
    if isinstance(corr_pairs, DataFrame):
        rows = [
            (r["feature_a"], r["feature_b"], r["corr"])
            for r in corr_pairs.collect()
        ]
    else:
        rows = [tuple(r) for r in corr_pairs]
    cmap: dict[frozenset, float] = {
        frozenset((a, b)): c for a, b, c in rows if c is not None
    }
    kept: list[str] = []
    for f in ranked_features:
        if all(
            abs(cmap.get(frozenset((f, k)), 0.0)) < threshold for k in kept
        ):
            kept.append(f)
    return kept
