"""Large-input smoke for the continuation-2 operators — scale evidence
beyond the sf0.1 bench (the bench's documents/events tables are 5k/100k
rows; the 100 TB claims deserve a 10^7–10^8-row data point).

Generates inputs with ``spark.range`` (executor-side, no driver
materialization) and runs, at local[$SPARK_GRAFT_CPUS]:

1. ``pagerank``           — 50M-edge / 2M-node uniform digraph, 3 iters;
2. ``quantile_bin``       — fit (approx sketch) + transform over 100M
                            doubles in 20 groups;
3. ``check_constraints``  — 4 constraints in one pass over 100M rows;
4. ``cohort_retention``   — 100M events, 1M users, 52 weekly cohorts;
5. ``edit_distance_join`` — 200k short strings (id/title matching
                            regime) self-joined at k=1.

Each step reports rows_out and wall seconds; one JSON line at the end.
Usage: python tools/scale_smoke_ops.py [--small]  (--small = 1% sizes,
CI-speed sanity run of the same code paths)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    small = "--small" in sys.argv
    s = 0.01 if small else 1.0

    from featurescreening_jl_spark.plans.session import get_spark

    spark = get_spark("scale-smoke-ops")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def step(name, fn):
        t0 = time.perf_counter()
        rows = fn()
        dt = round(time.perf_counter() - t0, 2)
        results[name] = {"rows_out": rows, "sec": dt}
        print(f"{name}: {rows} rows in {dt}s", file=sys.stderr)

    # 1. pagerank — 50M edges, 2M nodes
    from featurescreening_jl_spark.operators.graph import pagerank

    n_edges, n_nodes = int(50e6 * s), int(2e6 * s)
    edges = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    step(
        "pagerank_50m_edges",
        lambda: pagerank(edges, iterations=3).count(),
    )

    # 2. quantile binning — 100M doubles, 20 groups, sketch fit
    from featurescreening_jl_spark.operators.feature_encoding import (
        fit_quantile_bins,
        quantile_bin,
    )

    n_vals = int(100e6 * s)
    vals = spark.range(n_vals).select(
        (F.col("id") % 20).cast("string").alias("g"),
        (F.sin("id") * F.col("id")).alias("v"),
    )
    def _qb():
        bins = fit_quantile_bins(vals, "v", 10, by="g", approx=True)
        return quantile_bin(vals, bins, "v", by="g").where(
            F.col("bucket") >= 5
        ).count()
    step("quantile_bin_100m", _qb)

    # 3. constraint gate — one pass, 100M rows
    from featurescreening_jl_spark.operators.dataquality import (
        check_constraints,
    )

    rows = spark.range(n_vals).select(
        F.col("id"),
        (F.col("id") % 1000).alias("code"),
        F.concat(F.lit("u"), (F.col("id") % 97).cast("string")).alias("tag"),
    )
    step(
        "dq_checks_100m",
        lambda: check_constraints(
            rows,
            [
                ("not_null", "id"),
                ("in_range", "code", 0, 999),
                ("matches", "tag", "^u[0-9]+$"),
                ("unique", "id"),
            ],
        ).count(),
    )

    # 4. cohort retention — 100M events, 1M users, 52 weeks
    from featurescreening_jl_spark.operators.window_features import (
        cohort_retention,
    )

    n_users = int(1e6 * s)
    ev = spark.range(n_vals).select(
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + (F.xxhash64("id") % (52 * 7 * 86400))
        ).alias("ts"),
    )
    step(
        "cohort_retention_100m",
        lambda: cohort_retention(ev).count(),
    )

    # 5. fuzzy join — 200k short strings, k=1
    from featurescreening_jl_spark.operators.fuzzy_join import (
        edit_distance_join,
    )

    n_strs = int(200e3 * s)
    strs = spark.range(n_strs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("item-"),
            (F.xxhash64("id") % 100000).cast("string"),
            F.lit("-"),
            (F.col("id") % 1000).cast("string"),
        ).alias("text"),
    )
    step(
        "fuzzy_join_200k",
        lambda: edit_distance_join(
            strs, strs, max_dist=1, max_gram_df=5000
        ).where(F.col("id_a") < F.col("id_b")).count(),
    )

    print(json.dumps({
        "metric": "scale_smoke_ops",
        "scale": s,
        "cpus": spark.sparkContext.defaultParallelism,
        "steps": results,
        "total_sec": round(sum(r["sec"] for r in results.values()), 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
