"""Corpus-preparation job — the training-data twin of ``screen_job``.

One spark-submit entry chaining the engine's data-prep operators into the
standard pre-training pipeline shape, with per-stage row-count metrics
observed ON the flowing plan (``df.observe`` — zero extra actions; the
single output write harvests every stage counter) and per-partition
output lineage recorded to the metrics JSON:

    ingest → markup strip → quality gate → exact dedup → near-dup pair
    graph → (keep-best-per-cluster | soft 1/cluster-size weights) →
    leakage-safe closure-atomic split → partitioned parquet + metrics

Usage (cluster):
    spark-submit --py-files dist/featurescreening_jl_spark.zip \
        jobs/corpus_prep_job.py --input docs.parquet --output out/ \
        [--min-quality 0.3] [--jaccard-threshold 0.8] [--hashed-verify] \
        [--soft-dedup] [--splits train=0.98,val=0.01,test=0.01] \
        [--metrics-out out/metrics.json] [--seed 42]

Every stage is an engine operator (see SURVEY §2); this file is glue +
metrics only.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output parquet dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.0,
                   help="drop docs with quality_score below this (0 = off)")
    p.add_argument("--strip-markup", action="store_true",
                   help="strip HTML/markup before any other stage")
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--hashed-verify", action="store_true",
                   help="two-tier hash-space screen + exact string verify "
                        "(the long-document scale path)")
    p.add_argument("--soft-dedup", action="store_true",
                   help="keep near-duplicates but attach 1/cluster-size "
                        "sampling weights instead of dropping them")
    p.add_argument("--splits", default="train=0.98,val=0.01,test=0.01",
                   help="name=weight[,name=weight...]; closure-atomic over "
                        "the near-dup pair graph")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--metrics-out", default=None,
                   help="path for the per-stage/per-partition metrics JSON")
    p.add_argument("--verbosity", type=int, default=1)
    return p.parse_args(argv)


def parse_splits(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        out[name.strip()] = float(w)
    return out


def build(spark, args):
    """Assemble the full pipeline plan plus its Observations. Returns
    (result_df, observations dict, pairs_df)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from featurescreening_jl_spark.operators.dedup import (
        dedup_exact,
        leakage_safe_split,
        minhash_lsh_pairs,
        soft_dedup_weights,
    )
    from featurescreening_jl_spark.operators.text_analysis import (
        quality_score,
        strip_markup,
    )

    obs: dict[str, Observation] = {}

    def observed(df, stage: str):
        o = Observation()
        obs[stage] = o
        return df.observe(o, F.count(F.lit(1)).alias("rows"))

    docs = observed(spark.read.parquet(args.input), "ingest")
    if args.strip_markup:
        docs = docs.withColumn(
            args.text_col, strip_markup(F.col(args.text_col))
        )
    if args.min_quality > 0:
        docs = observed(
            docs.where(
                quality_score(F.col(args.text_col)) >= args.min_quality
            ),
            "quality_gate",
        )
    docs = observed(
        dedup_exact(docs, args.id_col, args.text_col), "exact_dedup"
    )
    # the near-dup pair graph drives BOTH the representative/weight stage
    # and the leakage-safe split; materialize it once
    pairs = minhash_lsh_pairs(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        shingle_n=args.shingle_n,
        jaccard_threshold=args.jaccard_threshold,
        hashed_verify=args.hashed_verify,
    ).localCheckpoint()

    split = leakage_safe_split(
        docs,
        pairs,
        parse_splits(args.splits),
        id_col=args.id_col,
        seed=args.seed,
    )
    if args.soft_dedup:
        w = soft_dedup_weights(docs, pairs, id_col=args.id_col)
        enriched = docs.join(w, args.id_col).join(
            split.select(args.id_col, "split"), args.id_col
        )
    else:
        # hard near-dedup: keep the min-id representative per closure
        # (cluster_label IS the min reachable id, so representative rows
        # are exactly id == label; singletons keep themselves)
        keep = split.where(
            F.col(args.id_col) == F.col("cluster_label")
        ).select(args.id_col, "cluster_label", "split")
        enriched = docs.join(keep, args.id_col)
    return observed(enriched, "output"), obs, pairs


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    logging.basicConfig(
        level=logging.INFO if args.verbosity else logging.WARNING,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    log = logging.getLogger("corpus_prep_job")

    from pyspark.sql import functions as F

    from featurescreening_jl_spark.plans.session import get_spark

    spark = get_spark("corpus-prep-job")
    result, obs, pairs = build(spark, args)

    # ONE action writes the corpus and fires every stage observation.
    # REBALANCE(split) before a partitionBy(split) write is the
    # small-files guard at scale: without it every upstream task opens a
    # file per split value (tasks × splits files); with it AQE sizes the
    # write tasks to advisoryPartitionSizeInBytes — coalescing tiny
    # splits AND splitting a skewed one (train ≫ val/test here), which a
    # plain repartition("split") cannot do (one task per split value).
    (
        result.hint("rebalance", "split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(args.output)
    )

    stage_rows = {k: o.get["rows"] for k, o in obs.items()}
    n_pairs = pairs.count()
    # per-partition lineage of what was written (read back the committed
    # files so the record describes the artifact, not the plan)
    written = spark.read.parquet(args.output)
    per_split = {
        r["split"]: r["n"]
        for r in written.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    metrics = {
        "stages": stage_rows,
        "near_dup_pairs": n_pairs,
        "splits": per_split,
        "config": {
            "jaccard_threshold": args.jaccard_threshold,
            "hashed_verify": args.hashed_verify,
            "soft_dedup": args.soft_dedup,
            "min_quality": args.min_quality,
            "seed": args.seed,
        },
    }
    log.info("corpus_prep metrics: %s", json.dumps(metrics))
    if args.metrics_out:
        with open(args.metrics_out, "w") as fh:
            json.dump(metrics, fh, indent=2, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
