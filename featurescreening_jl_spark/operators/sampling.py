"""Deterministic sampling / splitting / mixing for training-data pipelines.

The three dataset-assembly operations every large-scale training corpus
build needs, expressed so the SAME rows are selected no matter the cluster
size, partitioning, or execution order:

- ``hash_split``        — train/val/test assignment from a portable hash
  of each row's key. Spark's ``rand(seed)`` is partition-index-dependent
  (the same row can change split when the input is repartitioned or the
  cluster is resized — silent leakage between train and test across
  reruns); a key hash is a pure per-row function, reproducible by any
  engine, any layout, any scale.
- ``stratified_sample`` — per-stratum keep fractions (e.g. downsample
  English to 10%, keep low-resource languages whole) with the same
  hash-uniform, so a re-run at 4× executors keeps the identical rows.
- ``per_key_cap``       — at most ``n`` rows per key in a deterministic
  order (quota sampling: cap documents per domain, turns per
  conversation, examples per label).
- ``weighted_mix``      — assemble one corpus from several sources at
  given keep fractions, tagging provenance.

All pure codegen expressions (portable md5-based hash → unit interval);
no UDFs, no RNG state, no actions. Every operator is DuckDB-reproducible,
which is what lets the driver oracle-check exact row membership, not just
counts.

Scale notes: ``hash_split`` / ``stratified_sample`` / ``weighted_mix``
are map-only (no shuffle — filters and projections over the scan);
``per_key_cap`` shuffles once on the key (the cap is per-key global, so a
shuffle is semantically required); a hot key concentrates its rows in one
partition — cap first on coarse keys or pre-aggregate if a single key can
exceed a partition's memory.

Reference scope: FeatureScreening.jl's only sampling is the RNG feature
shuffle inside ``screen`` (reference ``src/FeatureScreening.jl``); these
dataset-level operators are part of the LLM-training-data graft layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from featurescreening_jl_spark.operators.dedup import hash60_portable

__all__ = [
    "hash_int",
    "hash_unit",
    "hash_split",
    "stratified_sample",
    "exact_stratified_sample",
    "per_key_cap",
    "weighted_mix",
    "weighted_reservoir",
    "token_budget_mix",
    "temperature_weights",
    "hash_negatives",
]

# 2^60 — hash60_portable's range; division lands in [0, 1).
_HASH_RANGE = float(1 << 60)


def hash_int(key: Column, seed: int = 42) -> Column:
    """The EXACT 60-bit portable hash of ``seed:key`` — the single
    definition of the joint-string construction every sampler (and
    every ``md5(seed || ':' || key)`` oracle) keys on. Use this, not a
    re-derived concat, wherever exact-integer ordering or membership is
    compared against an oracle: :func:`hash_unit`'s double quotient
    only keeps a 53-bit mantissa."""
    joint = F.concat_ws(":", F.lit(str(seed)), key.cast("string"))
    return hash60_portable(joint)


def hash_unit(key: Column, seed: int = 42) -> Column:
    """Uniform double in [0, 1) from a portable hash of ``seed:key``.

    DuckDB-reproducible:
    ``('0x' || substr(md5(seed || ':' || key), 1, 15))::BIGINT
    / 1152921504606846976.0`` — the contract the driver oracles verify.
    Different ``seed`` values give independent assignments (the seed is
    hashed with the key, not added after).
    """
    return hash_int(key, seed) / F.lit(_HASH_RANGE)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    key_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash-unit ranges.

    ``weights`` maps split name -> weight (normalized internally; ORDER
    of insertion defines the ranges, so pass a plain dict — Python dicts
    preserve order). Rows with equal keys always land in the same split,
    making the key the leakage boundary: split on ``conv_id`` and a
    conversation can never straddle train/test.
    """
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("hash_split: weights must sum to a positive value")
    u = hash_unit(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum hash-deterministic fraction of rows.

    ``fractions`` maps stratum value -> keep fraction in [0, 1]; strata
    not listed keep ``default_fraction`` (0 = drop, 1 = keep whole).
    Unlike ``DataFrame.sampleBy`` (Bernoulli on a partition-seeded RNG —
    different rows on every layout), re-running at any cluster size keeps
    the IDENTICAL rows, so downstream caches/joins stay consistent.
    """
    u = hash_unit(F.col(key_col), seed)
    frac = None
    for value, f in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        frac = F.when(cond, float(f)) if frac is None else frac.when(
            cond, float(f)
        )
    frac = (
        F.lit(float(default_fraction))
        if frac is None
        else frac.otherwise(float(default_fraction))
    )
    return df.where(u < frac)


def per_key_cap(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    *,
    order_by: list[Column | str],
    keep_rank: str | None = None,
) -> DataFrame:
    """At most ``n`` rows per key, taken in ``order_by`` order (quota
    sampling). Pass a total order (tie-break on a unique column) for a
    deterministic result. One shuffle on the key; see module scale notes
    for the hot-key caveat."""
    w = Window.partitionBy(*key_cols).orderBy(*order_by)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    out = ranked.where(F.col("__rk") <= n)
    if keep_rank is not None:
        return out.withColumnRenamed("__rk", keep_rank)
    return out.drop("__rk")


def weighted_reservoir(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    key_col: str,
    seed: int = 42,
    score_col: str | None = None,
) -> DataFrame:
    """Distributed weighted random sample of ``k`` rows WITHOUT
    replacement, selection probability ∝ ``weight_col`` (Efraimidis &
    Spirakis A-Res: each row gets key ``u^(1/w)`` with ``u`` uniform in
    [0,1); the k largest keys are exactly a weighted
    without-replacement draw). Rows with non-positive weight are never
    selected (probability 0 — the same contract as numpy
    ``choice(p=...)`` with zero entries).

    This is the data-resident counterpart of the reference's
    ``SelectRandom`` / ``SelectByImportance`` driver-side weighted
    sampling (reference ``src/importance.jl:172-232``): the same draw
    semantics for collections too large to collect to the driver (e.g.
    importance-weighted corpus subsampling over 10^12 rows).

    Scale + determinism: ``u`` is the portable md5 hash of
    ``seed:key`` — a pure per-row function, so the selected set is
    IDENTICAL at any parallelism/partitioning (unlike ``rand(seed)``,
    which is partition-index-seeded) and exactly reproducible by the
    DuckDB oracle. The global top-k plans as TakeOrderedAndProject:
    each partition keeps its local top-k and only those k·partitions
    candidate rows reach the driver merge — no global sort, no shuffle
    of non-winners.
    """
    if k <= 0:
        raise ValueError("weighted_reservoir: k must be positive")
    w = F.col(weight_col).cast("double")
    u = hash_unit(F.col(key_col), seed)
    score = F.pow(u, F.lit(1.0) / w)
    name = score_col or "__wr_score"
    out = (
        df.where(w > 0)
        .withColumn(name, score)
        .orderBy(F.desc(name), F.asc(key_col))
        .limit(k)
    )
    return out if score_col else out.drop(name)


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, float],
    *,
    source_col: str = "source",
    token_col: str,
    key_col: str,
    seed: int = 42,
    frac_col: str | None = None,
) -> DataFrame:
    """Downsample each source to a TOKEN budget (not a row fraction) —
    the mixture-reweighting step of corpus assembly ("2B tokens of web,
    all of wiki"): keep fraction = min(1, budget_tokens / observed source
    tokens), then the usual per-source hash-deterministic filter. Sources
    absent from ``budgets`` are dropped (a mixture spec must be total —
    silence would mean "keep at an undefined rate").

    Two-pass by necessity (the fraction depends on the observed totals):
    pass 1 is a tiny per-source aggregate (rows = #sources) broadcast back;
    pass 2 is the map-only hash filter. The kept-row SET is deterministic
    for a fixed input at any parallelism; ``frac_col`` (optional) exposes
    each row's keep fraction for audit.
    """
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("__tot")
    )
    frac = None
    for name, budget in budgets.items():
        cond = F.col(source_col) == F.lit(name)
        val = F.least(
            F.lit(1.0), F.lit(float(budget)) / F.col("__tot").cast("double")
        )
        frac = F.when(cond, val) if frac is None else frac.when(cond, val)
    frac = F.lit(0.0) if frac is None else frac.otherwise(F.lit(0.0))
    u = hash_unit(
        F.concat_ws("|", F.col(source_col), F.col(key_col).cast("string")),
        seed,
    )
    out = (
        df.join(F.broadcast(totals), on=source_col)
        .withColumn("__frac", frac)
        .where(u < F.col("__frac"))
        .drop("__tot")
    )
    if frac_col is not None:
        return out.withColumnRenamed("__frac", frac_col)
    return out.drop("__frac")


def weighted_mix(
    sources: list[tuple[str, DataFrame, float]],
    *,
    key_col: str,
    seed: int = 42,
    source_col: str = "source_name",
) -> DataFrame:
    """Assemble one corpus from ``(name, df, keep_fraction)`` sources:
    each source is hash-downsampled to its fraction (per-source seed
    stream: ``seed:name`` — the same key in two sources draws independent
    coins) and tagged with ``source_col``. Columns are unioned by name;
    every source must share a schema."""
    if not sources:
        raise ValueError("weighted_mix: at least one source required")
    parts = []
    for name, df, frac in sources:
        u = hash_unit(
            F.concat_ws("|", F.lit(name), F.col(key_col).cast("string")),
            seed,
        )
        parts.append(
            df.where(u < F.lit(float(frac))).withColumn(
                source_col, F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def temperature_weights(
    df: DataFrame,
    *,
    group_col: str = "source",
    size_col: str,
    tau: float = 0.7,
    budget: float | None = None,
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual-corpus
    rebalancing rule (XLM-R / mT5 style): sampling weight
    ``w_i ∝ share_i^tau`` with ``share_i`` a group's fraction of the
    corpus by ``size_col`` (tokens, chars, rows). ``tau = 1`` keeps the
    natural distribution; ``tau -> 0`` flattens toward uniform, lifting
    low-resource groups. With ``budget`` given, each group also gets its
    target allocation ``w_i * budget`` and the implied ``sample_factor``
    (target / observed size; > 1 means the group must be oversampled /
    repeated).

    Plan shape: ONE hash aggregate collapses the corpus to |groups| rows
    (map-side partials); the two normalizing sums then run as windows
    over that already-tiny aggregate — at any corpus scale the window
    input is the number of sources/languages, so the single-partition
    window is free by construction, and the corpus itself is scanned
    exactly once.

    Output: ``group_col``, ``group_size``, ``share``, ``weight``,
    and with ``budget``: ``target_size``, ``sample_factor`` (all rounded
    to 6 dp).
    """
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    sizes = df.groupBy(group_col).agg(
        F.sum(F.col(size_col).cast("double")).alias("group_size")
    )
    everything = Window.partitionBy()
    share = F.col("group_size") / F.sum("group_size").over(everything)
    scaled = sizes.select(
        group_col,
        "group_size",
        share.alias("__share"),
        F.pow(share, F.lit(float(tau))).alias("__pow"),
    )
    weight = F.col("__pow") / F.sum("__pow").over(everything)
    out = scaled.select(
        group_col,
        F.round("group_size", 6).alias("group_size"),
        F.round("__share", 6).alias("share"),
        F.round(weight, 6).alias("weight"),
        *(
            [
                F.round(weight * F.lit(float(budget)), 6).alias(
                    "target_size"
                ),
                F.round(
                    weight * F.lit(float(budget)) / F.col("group_size"), 6
                ).alias("sample_factor"),
            ]
            if budget is not None
            else []
        ),
    )
    return out


def hash_negatives(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic negative sampling for contrastive / retrieval
    training pairs: each anchor gets ``k`` pseudo-random negatives drawn
    by hashing, with NO RNG state — re-runs, resumes, and other engines
    (the DuckDB oracle) reproduce the exact same pairs.

    Scale shape — deliberately NOT "hash mod N over a global row index"
    (a dense index needs a global sort/zipWithIndex): rows hash into
    ``n_buckets`` buckets, each bucket elects one deterministic
    representative (min portable-hash, id tie-break), and anchor × slot
    hashes pick a TARGET bucket whose representative is the negative.
    The representative table is ``n_buckets`` rows — broadcast — so the
    whole operator is one bounded aggregate + one broadcast join + a
    map-side explode of k slots per anchor; the corpus never shuffles.
    Self-pairs are filtered (an anchor can hash to its own bucket), two
    slots may land in one bucket (draws WITH replacement, the standard
    contract), and a slot targeting an EMPTY bucket yields no row — so
    per-anchor negatives are ≤ k, not exactly k. Size ``n_buckets`` ≫ k
    for draw diversity yet small enough that every bucket is occupied
    (corpus ≫ n_buckets — trivially true at scale) and the
    representative table broadcasts.

    Output: ``(id_col, slot, neg_id)``.
    """
    from featurescreening_jl_spark.operators.dedup import hash60_portable

    if k < 1:
        raise ValueError("hash_negatives: k must be >= 1")
    sid = F.col(id_col).cast("string")
    bucket = F.pmod(
        hash60_portable(F.concat(F.lit("b:"), sid)), F.lit(int(n_buckets))
    )
    rep_hash = hash60_portable(F.concat(F.lit("r:"), sid))
    reps = (
        df.select(F.col(id_col), bucket.alias("__b"), rep_hash.alias("__rh"))
        .groupBy("__b")
        .agg(
            F.min(F.struct(F.col("__rh"), F.col(id_col).alias("__id")))[
                "__id"
            ].alias("neg_id")
        )
    )
    anchors = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    ).withColumn(
        "__tb",
        F.pmod(
            hash60_portable(
                F.concat(
                    F.lit("n:"), sid, F.lit(":"), F.col("slot").cast("string")
                )
            ),
            F.lit(int(n_buckets)),
        ),
    )
    return (
        anchors.join(
            F.broadcast(reps), anchors["__tb"] == reps["__b"]
        )
        .where(F.col("neg_id") != F.col(id_col))
        .select(id_col, "slot", "neg_id")
    )


def exact_stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    n_total: int,
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``n_total`` rows, apportioned across strata by the
    largest-remainder (Hamilton) method, each stratum contributing its
    ``n_k`` smallest-portable-hash rows.

    :func:`stratified_sample` keeps a hash-threshold FRACTION — right
    when proportions matter and counts may float with the data. This is
    the other contract: the output SIZE is fixed (eval slices, fixed
    labeling budgets, benchmark subsets), re-runs at any parallelism
    return the identical rows, and the quota split is exact-integer
    arithmetic (quota_k = n_total*c_k/N; floors first, the remaining
    seats go to the largest remainders ``(n_total*c_k) mod N``, ties to
    the bigger stratum then the smaller stratum value) — deterministic
    and replayable verbatim in SQL. NULL strata count as ``<NULL>``
    (the skew_profile convention), not silently dropped.

    Plan: ONE map-side-combined count aggregate (|strata| rows to the
    driver for the apportionment), then ONE per-stratum rank window
    ordered by ``hash_unit(seed:key)``. The window is the
    oracle-checkable verifier form; its one-task-per-stratum sort is the
    known trap for a mega-stratum at 10^12 rows — the documented scale
    swap-in is the ``global_rank`` machinery per stratum (range-partition
    by hash, broadcast per-partition offsets) or a two-phase hash
    threshold (approx_percentile at n_k/c_k, exact top-off at the
    boundary), the same exact-verifier/sketch-path trade as
    ``length_quantiles``. ``n_total`` must be <= the row count; ``n_k``
    never exceeds its stratum's size (quota_k <= c_k when
    n_total <= N).
    """
    if n_total < 0:
        raise ValueError("exact_stratified_sample: n_total must be >= 0")
    s = F.coalesce(F.col(strata_col).cast("string"), F.lit("<NULL>"))
    counts = sorted(
        (r["s"], r["cnt"])
        for r in df.groupBy(s.alias("s"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    total = sum(c for _, c in counts)
    if n_total > total:
        raise ValueError(
            f"exact_stratified_sample: n_total={n_total} > {total} rows"
        )
    alloc = {v: (n_total * c) // total for v, c in counts}
    extra = n_total - sum(alloc.values())
    by_remainder = sorted(
        counts, key=lambda vc: (-((n_total * vc[1]) % total), -vc[1], vc[0])
    )
    for v, _ in by_remainder[:extra]:
        alloc[v] += 1
    quota = None
    for v, n_k in alloc.items():
        cond = s == F.lit(v)
        quota = (
            F.when(cond, n_k) if quota is None else quota.when(cond, n_k)
        )
    quota = F.lit(0) if quota is None else quota.otherwise(0)
    # rank by the EXACT 60-bit integer hash, not hash_unit's double
    # (integer / 2^60 only keeps a 53-bit mantissa — two in-stratum rows
    # whose hashes differ in the low 7 bits would collapse to the same
    # double and fall through to the key tie-break, while the SQL oracle
    # orders by the full integer: a possible membership flip at the quota
    # boundary, ~N²/2^54 likely but exactly zero when both sides rank by
    # the same integer). key_col stays as the genuine-collision tie-break.
    w = Window.partitionBy(s).orderBy(
        hash_int(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota)
        .drop("__rk")
    )
