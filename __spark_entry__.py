"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full Layer-B→Layer-A pipeline (windowed
point-in-time featurization of the events stream → random-forest
tournament screening) at sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators, each with a DuckDB
oracle where SQL-expressible. Column names and float rounding are aligned
on both sides so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from featurescreening_jl_spark.functions.time import epoch_seconds

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def _event_features(events: DataFrame) -> "DataFrame":
    """Point-in-time features per event: sessionization, lag, running
    aggregates over (user_id / ts, event_id) — all frames end at the
    current row (zero temporal leakage)."""
    from featurescreening_jl_spark.operators.window_features import (
        sessionize,
        with_lag_lead,
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = sessionize(
        events, gap_seconds=1800, by="user_id", order=("ts", "event_id")
    )
    df = with_lag_lead(
        df,
        {"lag1_value": ("value", -1), "lag2_value": ("value", -2)},
        by="user_id",
        order=("ts", "event_id"),
    )
    prev_ts = F.lag("ts").over(w)
    return (
        df.withColumn(
            "time_since_prev",
            F.coalesce(
                epoch_seconds(F.col("ts")) - epoch_seconds(prev_ts), F.lit(0)
            ).cast("double"),
        )
        .withColumn("cum_events", F.count("*").over(running).cast("double"))
        .withColumn("cum_value", F.sum("value").over(running).cast("double"))
        .withColumn("session_id_f", F.col("session_id").cast("double"))
        .withColumn("lag1_value", F.coalesce("lag1_value", F.lit(0.0)))
        .withColumn("lag2_value", F.coalesce("lag2_value", F.lit(0.0)))
        .withColumn(
            "value_minus_lag1", F.col("value") - F.col("lag1_value")
        )
    )


FLAGSHIP_FEATURES = [
    "value",
    "lag1_value",
    "lag2_value",
    "time_since_prev",
    "cum_events",
    "cum_value",
    "session_id_f",
    "value_minus_lag1",
]


def entry(spark: SparkSession) -> DataFrame:
    """Featurize sf0.001 events, screen the feature set with the RF
    tournament, return the screened feature matrix."""
    from featurescreening_jl_spark import FeatureFrame, screen

    events = _t(spark, SF_DEFAULT, "events")
    feats = _event_features(events).select(
        F.col("event_id").alias("sample_id"),
        F.col("event_type").alias("label"),
        *[F.col(c) for c in FLAGSHIP_FEATURES],
    )
    ff = FeatureFrame(feats, FLAGSHIP_FEATURES)
    result = screen(
        ff,
        reduced_size=3,
        step_size=3,
        config={"n_trees": 20, "max_depth": 8, "min_samples_leaf": 5,
                "min_purity_increase": 0.0},
        rng=42,
        show_progress=False,
    )
    return result.df


# ---------------------------------------------------------------------------
# operator queries + oracles
# ---------------------------------------------------------------------------


def q_projection(spark, sf):
    return _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def q_column_merge_join(spark, sf):
    # the reference's merge() general case: row-aligned column union of two
    # separately materialized sides = equi-join (broadcast the small side)
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_acctbal")
    )


def q_hash_count_agg(spark, sf):
    # the importance-count shape: SELECT key, count(*) GROUP BY key
    return (
        _t(spark, sf, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.count("*").alias("cnt"))
    )


def q_topk(spark, sf):
    # sort+limit with deterministic tie-break (count desc, key asc) —
    # Spark plans TakeOrderedAndProject
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(10)
    )


def q_select_top_fraction(spark, sf):
    # SelectTop(0.25) data-side: floor(n * ratio) prefix of the ranked list
    sup = _t(spark, sf, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    n = Window.partitionBy()
    return (
        sup.select(
            "s_suppkey",
            "s_acctbal",
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(n).alias("__n"),
        )
        .where(F.col("__rn") <= F.floor(F.col("__n") * 0.25))
        .select("s_suppkey", "s_acctbal")
    )


def q_lag_lead_window(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


def q_sessionize(spark, sf):
    from featurescreening_jl_spark.operators.window_features import sessionize

    ev = _t(spark, sf, "events")
    out = sessionize(ev, gap_seconds=1800, by="user_id", order=("ts", "event_id"))
    return out.select("event_id", "user_id", "session_id")


def q_running_agg(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf, "events").select(
        "event_id",
        F.count("*").over(w).alias("cum_events"),
        F.round(F.sum("value").over(w), 4).alias("cum_value"),
    )


def _asof_inputs(spark, sf):
    ev = _t(spark, sf, "events")
    queries = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    sources = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    return queries, sources


def q_asof_join_window(spark, sf):
    from featurescreening_jl_spark.operators.asof_join import asof_join

    queries, sources = _asof_inputs(spark, sf)
    out = asof_join(
        queries, sources, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="window",
    )
    return out.select("event_id", "user_id", "last_purchase_value")


def q_asof_join_bucketed(spark, sf):
    from featurescreening_jl_spark.operators.asof_join import asof_join

    queries, sources = _asof_inputs(spark, sf)
    out = asof_join(
        queries, sources, on="ts", by="user_id",
        value_cols=["last_purchase_value"], strategy="bucketed",
        bucket_seconds=86400,
    )
    return out.select("event_id", "user_id", "last_purchase_value")


def q_multi_agg_rollup(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            (
                F.max(epoch_seconds(F.col("ts"))) - F.min(epoch_seconds(F.col("ts")))
            ).alias("duration_sec"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


def q_dedup_exact(spark, sf):
    from featurescreening_jl_spark.operators.dedup import dedup_exact

    docs = _t(spark, sf, "documents")
    return dedup_exact(docs).select("doc_id", "n_chars")


def q_text_stats(spark, sf):
    docs = _t(spark, sf, "documents")
    trimmed = F.trim(F.col("text"))
    n_chars = F.length("text").cast("long")
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("text_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars.cast("double") / n_tokens.cast("double"), 4).alias(
            "mean_word_len"
        ),
    )


def q_lang_distribution(spark, sf):
    return (
        _t(spark, sf, "documents").groupBy("lang").agg(F.count("*").alias("cnt"))
    )


def q_cosine_topk(spark, sf):
    from featurescreening_jl_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=5, round_decimals=4)
    return out.select("vec_id", "similarity", F.col("rank").cast("long").alias("rank"))


def q_minhash_pairs(spark, sf):
    # hash-seeded → not SQL-oracle-expressible; driver records rows-only
    from featurescreening_jl_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf, "documents").limit(300)
    return minhash_lsh_pairs(docs, jaccard_threshold=0.8).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


def q_screen_pipeline(spark, sf):
    # RF tournament — not SQL-expressible; rows-only check
    from featurescreening_jl_spark import FeatureFrame, screen

    events = _t(spark, sf, "events")
    feats = _event_features(events).select(
        F.col("event_id").alias("sample_id"),
        F.col("event_type").alias("label"),
        *[F.col(c) for c in FLAGSHIP_FEATURES],
    )
    ff = FeatureFrame(feats, FLAGSHIP_FEATURES)
    result = screen(
        ff,
        reduced_size=3,
        step_size=3,
        config={"n_trees": 20, "max_depth": 8, "min_samples_leaf": 5,
                "min_purity_increase": 0.0},
        rng=42,
        show_progress=False,
    )
    return result.df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "projection": q_projection,
        "column_merge_join": q_column_merge_join,
        "hash_count_agg": q_hash_count_agg,
        "topk": q_topk,
        "select_top_fraction": q_select_top_fraction,
        "lag_lead_window": q_lag_lead_window,
        "sessionize": q_sessionize,
        "running_agg": q_running_agg,
        "asof_join_window": q_asof_join_window,
        "asof_join_bucketed": q_asof_join_bucketed,
        "multi_agg_rollup": q_multi_agg_rollup,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "lang_distribution": q_lang_distribution,
        "cosine_topk": q_cosine_topk,
        "minhash_pairs": q_minhash_pairs,
        "screen_pipeline": q_screen_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "projection": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
        """,
        "column_merge_join": """
            SELECT o.o_orderkey, o.o_totalprice, c.c_acctbal
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "hash_count_agg": """
            SELECT l_returnflag AS flag, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag
        """,
        "topk": """
            SELECT l_partkey, round(sum(l_quantity), 4) AS total_qty
            FROM lineitem GROUP BY l_partkey
            ORDER BY total_qty DESC, l_partkey ASC LIMIT 10
        """,
        "select_top_fraction": """
            SELECT s_suppkey, s_acctbal FROM (
              SELECT s_suppkey, s_acctbal,
                     row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn,
                     count(*) OVER () AS n
              FROM supplier
            ) WHERE rn <= floor(n * 0.25)
        """,
        "lag_lead_window": """
            SELECT event_id, user_id,
                   lag(value) OVER w AS prev_value,
                   lead(value) OVER w AS next_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "sessionize": """
            SELECT event_id, user_id,
                   (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - 1)::BIGINT AS session_id
            FROM (
              SELECT event_id, user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
        """,
        "running_agg": """
            SELECT event_id,
                   count(*) OVER w AS cum_events,
                   round(sum(value) OVER w, 4) AS cum_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "asof_join_window": """
            SELECT q.event_id, q.user_id, s.value AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') q
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') s
            ON q.user_id = s.user_id AND q.ts >= s.ts
        """,
        "asof_join_bucketed": """
            SELECT q.event_id, q.user_id, s.value AS last_purchase_value
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') q
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') s
            ON q.user_id = s.user_id AND q.ts >= s.ts
        """,
        "multi_agg_rollup": """
            SELECT user_id,
                   count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT
                       AS duration_sec,
                   round(avg(value), 4) AS avg_value
            FROM events GROUP BY user_id
        """,
        "dedup_exact": """
            SELECT d.doc_id, d.n_chars
            FROM documents d
            JOIN (
              SELECT min(doc_id) AS doc_id
              FROM documents
              GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
            ) k USING (doc_id)
        """,
        "text_stats": """
            SELECT doc_id,
                   length(text)::BIGINT AS text_chars,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END)::BIGINT AS n_tokens,
                   round(length(text)::DOUBLE /
                         (CASE WHEN length(trim(text)) = 0 THEN 0
                               ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                          END), 4) AS mean_word_len
            FROM documents
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
        """,
        "cosine_topk": """
            SELECT vec_id, similarity, rank FROM (
              SELECT e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                  q.embedding::DOUBLE[]), 4)
                         AS similarity,
                     row_number() OVER (
                       ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                                             q.embedding::DOUBLE[]), 4)
                                DESC, e.vec_id ASC) AS rank
              FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            ) WHERE rank <= 5
        """,
    }
