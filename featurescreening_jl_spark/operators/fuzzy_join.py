"""Edit-distance (fuzzy) join — entity resolution / typo-tolerant dedup.

Finds all cross-table pairs with Levenshtein distance ≤ k WITHOUT the
|L|×|R| cross product, using two PROVABLY-SOUND prefilters (every true
match survives both; the exact verify then decides membership — output
is exactly the brute-force result):

1. **length window** — an edit changes length by ≤ 1, so
   ``| |a| − |b| | ≤ k`` for any true pair;
2. **q-gram count bound** (Gravano et al., "Approximate String Joins in
   a Database (Almost) for Free", VLDB 2001): one edit destroys at most
   ``q`` of a string's overlapping character q-grams, so a true pair
   shares (counting multiplicity)
   ``shared ≥ max(|a|,|b|) − q + 1 − k·q``.

The candidate generator is an inverted q-gram index join — cost tracks
gram-key collisions, never |L|×|R|. Hot grams (the stop-gram skew of
every inverted index) are handled SOUNDLY: grams with document
frequency above ``max_gram_df`` are dropped from the index, and the
count bound is lowered per pair by ``min(dropped_a, dropped_b)`` — the
maximum shared mass the dropped grams could have carried — so pruning
stays a superset filter (the cap trades candidate precision for index
balance, never recall; pinned by test).

Verify joins the surviving id pairs back to the texts and keeps
``levenshtein(a, b, k) != -1`` — Spark's thresholded (banded O(k·n))
form, not the full O(n²) DP.

Strings shorter than ``q + k`` make the count bound vacuous (≤ 0); they
simply pass filter 2 and are decided by the length window + verify —
correct, just less pruned, and worth a dedicated short-string path if a
corpus is dominated by them.

Reference scope: the reference has no string layer; this is the
training-data graft's fuzzy-matching primitive (SURVEY.md §2 LLM ops),
the edit-distance sibling of ``ngram_jaccard_pairs_indexed``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_join"]


def _gram_counts(df: DataFrame, id_col: str, text_col: str, q: int):
    """(id, len, gram, cnt) — multiset of overlapping char q-grams,
    keyed by their 64-bit hash: the index join shuffles 8-byte keys
    instead of strings, and a hash collision merely MERGES two grams'
    counts, which can only raise the computed shared mass
    (min(a1+a2, b1+b2) ≥ min(a1,b1) + min(a2,b2)) — the count filter
    stays a sound superset, and verify decides membership regardless."""
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - q + 1, F.lit(0))),
        lambda i: F.xxhash64(t.substr(i, F.lit(q))),
    )
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.length(t).alias("__len"),
            F.explode(grams).alias("__gram"),
        )
        .groupBy("__id", "__len", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_dist: int = 2,
    q: int = 3,
    max_gram_df: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein ≤ max_dist``.

    Returns ``(id_a, id_b, dist)`` — ``id_a`` from ``left``, ``id_b``
    from ``right``; identical-id pairs are not excluded (callers doing
    self-joins filter ``id_a < id_b`` themselves). Output equals the
    brute-force cross-product filter exactly; see module docstring for
    why the pruning is lossless.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2")
    k = int(max_dist)

    la = _gram_counts(left, id_col, text_col, q)
    lb = _gram_counts(right, id_col, text_col, q)

    if max_gram_df is not None:
        # global df over BOTH sides; dropped mass is tracked per string
        # so the bound can be lowered soundly
        df_tab = (
            la.select("__gram")
            .unionByName(lb.select("__gram"))
            .groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_gram_df)
            .select("__gram")
        )

        def split(g):
            dropped = (
                g.join(F.broadcast(df_tab), "__gram", "left_semi")
                .groupBy("__id", "__len")
                .agg(F.sum("__cnt").alias("__dropped"))
            )
            kept = g.join(F.broadcast(df_tab), "__gram", "left_anti")
            return kept, dropped

        la, da = split(la)
        lb, db = split(lb)
    else:
        da = db = None

    shared = (
        la.alias("a")
        .join(lb.alias("b"), "__gram")
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__len").alias("len_a"),
            F.col("b.__len").alias("len_b"),
        )
        .agg(F.sum(F.least("a.__cnt", "b.__cnt")).alias("__shared"))
    )
    cand = shared.where(
        F.abs(F.col("len_a") - F.col("len_b")) <= k
    )
    bound = (
        F.greatest("len_a", "len_b") - F.lit(q - 1) - F.lit(k * q)
    )
    if da is not None:
        cand = (
            cand.join(
                da.select(F.col("__id").alias("id_a"),
                          F.col("__dropped").alias("__da")),
                "id_a", "left",
            )
            .join(
                db.select(F.col("__id").alias("id_b"),
                          F.col("__dropped").alias("__db")),
                "id_b", "left",
            )
            .withColumn(
                "__slack",
                F.least(
                    F.coalesce("__da", F.lit(0)),
                    F.coalesce("__db", F.lit(0)),
                ),
            )
        )
        cand = cand.where(F.col("__shared") >= bound - F.col("__slack"))
    else:
        cand = cand.where(F.col("__shared") >= bound)

    # Vacuous-bound fallback. The count bound for a pair is positive only
    # when max(len_a, len_b) > LMIN = k·q + q − 1; a pair of two ≤-LMIN
    # strings may share ZERO grams yet still be a true match, and a
    # zero-shared pair never comes OUT of the index join at all — so
    # small×small pairs route through the length window alone. (Small ×
    # large pairs are safe: if the small side has no grams (len < q) the
    # length window already excludes any >LMIN partner; with grams, both
    # sides index and the positive bound prunes soundly.) Smalls are a
    # vanishing fraction of a document corpus — for a short-string-heavy
    # workload this O(|smalls|²-per-length-window) term is the cost to
    # watch.
    lmin = k * q + q - 1
    small_a = left.select(
        F.col(id_col).alias("id_a"),
        F.length(text_col).alias("len_a"),
    ).where(F.length(text_col) <= lmin)
    small_b = right.select(
        F.col(id_col).alias("id_b"),
        F.length(text_col).alias("len_b"),
    ).where(F.length(text_col) <= lmin)
    small_pairs = (
        small_a.crossJoin(F.broadcast(small_b))
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= k)
        .select("id_a", "id_b")
    )

    ids = cand.select("id_a", "id_b").unionByName(small_pairs)

    if da is not None:
        # Cap soundness, part 2: a true pair whose ONLY shared grams were
        # all dropped produces no row in the index join at all, yet
        # qualifies because slack ≥ bound. Such a pair needs BOTH sides'
        # dropped mass ≥ bound ≥ own_len − (q−1) − k·q, so the candidate
        # pool is the (tiny, length-windowed) cross of "mostly-hot"
        # strings — strings whose grams are dominated by stop-grams; the
        # exact predicate and verify still decide membership.
        def hot(d, ida, la_):
            return d.where(
                F.col("__dropped")
                >= F.col("__len") - F.lit(q - 1) - F.lit(k * q)
            ).select(
                F.col("__id").alias(ida), F.col("__len").alias(la_),
                F.col("__dropped").alias(f"__dm_{ida}"),
            )

        hot_pairs = (
            hot(da, "id_a", "len_a")
            .crossJoin(F.broadcast(hot(db, "id_b", "len_b")))
            .where(F.abs(F.col("len_a") - F.col("len_b")) <= k)
            .where(
                F.least("__dm_id_a", "__dm_id_b")
                >= F.greatest("len_a", "len_b")
                - F.lit(q - 1)
                - F.lit(k * q)
            )
            .select("id_a", "id_b")
        )
        ids = ids.unionByName(hot_pairs)

    ids = ids.distinct()
    ta = left.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")
    )
    tb = right.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")
    )
    dist = F.levenshtein("__ta", "__tb", k)
    return (
        ids.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", dist)
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
