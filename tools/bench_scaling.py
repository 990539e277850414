"""Two-parallelism scaling benchmark — the sandbox proxy for N vs 4N
executor clusters (BASELINE.json north_rule: scaling efficiency ≥ 0.8).

Runs the IDENTICAL featurize→screen job on the IDENTICAL transcripts input
at local[8] and local[32] (one fresh JVM per run via subprocess), reports
turns/sec at both and efficiency = throughput(4N) / (4 × throughput(N)).

Usage:
    python tools/bench_scaling.py [--convs 3000] [--reps 3] [--write-md]

``--write-md`` appends the measured table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.path.join(REPO, ".bench_tmp")

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from featurescreening_jl_spark.plans.session import get_spark
from featurescreening_jl_spark import FeatureFrame, screen
from featurescreening_jl_spark.operators.window_features import (
    TURN_FEATURE_COLS, turn_features,
)

parallelism = {parallelism}
reps = {reps}
spark = get_spark("bench-scaling", parallelism=parallelism,
                  shuffle_partitions=parallelism)
spark.sparkContext.setLogLevel("ERROR")

transcripts = spark.read.parquet({data!r})
n_turns = transcripts.count()

def run_once():
    feats = turn_features(transcripts).select(
        (F.xxhash64("conv_id") + F.col("turn_idx")).alias("sample_id"),
        F.when(F.col("label_next_is_tool") > 0, "tool").otherwise("no_tool")
            .alias("label"),
        *[F.col(c) for c in TURN_FEATURE_COLS],
    )
    ff = FeatureFrame(feats, TURN_FEATURE_COLS)
    result = screen(
        ff, reduced_size=4, step_size=5,
        config={{"n_trees": 20, "max_depth": 8, "min_samples_leaf": 10,
                 "min_purity_increase": 0.0}},
        rng=42, show_progress=False,
    )
    result.df.write.format("noop").mode("overwrite").save()

run_once()  # warm-up: JIT, codegen, shuffle services
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    run_once()
    times.append(time.perf_counter() - t0)
spark.stop()
print("RESULT " + json.dumps({{"parallelism": parallelism,
                               "n_turns": n_turns, "times": times}}))
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from featurescreening_jl_spark.plans.session import get_spark
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts
spark = get_spark("bench-gen", parallelism=32)
spark.sparkContext.setLogLevel("ERROR")
df = synthetic_transcripts(spark, n_conversations={convs}, seed=42)
df.repartition(64).write.mode("overwrite").parquet({data!r})
print("rows", spark.read.parquet({data!r}).count())
spark.stop()
"""


def run_py(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError("worker failed")
    return proc.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=3000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()

    data = os.path.join(TMP, "transcripts")
    os.makedirs(TMP, exist_ok=True)
    print(f"generating {args.convs} conversations …", flush=True)
    run_py(GEN.format(repo=REPO, convs=args.convs, data=data))

    results = {}
    for p in args.levels:
        print(f"running featurize→screen at local[{p}] ×{args.reps} …", flush=True)
        out = run_py(
            WORKER.format(repo=REPO, parallelism=p, reps=args.reps, data=data)
        )
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        results[p] = json.loads(line[len("RESULT "):])

    n_lo, n_hi = args.levels
    n_turns = results[n_lo]["n_turns"]
    med = {p: statistics.median(results[p]["times"]) for p in args.levels}
    thr = {p: n_turns / med[p] for p in args.levels}
    eff = thr[n_hi] / ((n_hi / n_lo) * thr[n_lo])
    summary = {
        "n_turns": n_turns,
        "median_sec": {str(p): round(med[p], 2) for p in args.levels},
        "turns_per_sec": {str(p): round(thr[p], 1) for p in args.levels},
        "scaling_efficiency": round(eff, 3),
        "levels": args.levels,
        "reps": args.reps,
        "all_times": {str(p): [round(t, 2) for t in results[p]["times"]]
                      for p in args.levels},
    }
    print(json.dumps(summary))

    if args.write_md:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        path = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(path, "a") as fh:
            fh.write(
                f"\n## Scaling run (featurize→screen, {n_turns} turns, "
                f"median of {args.reps})\n\n"
                f"| parallelism | median sec | turns/sec |\n|---|---|---|\n"
            )
            for p in args.levels:
                fh.write(f"| local[{p}] | {med[p]:.2f} | {thr[p]:.1f} |\n")
            fh.write(
                f"\nscaling efficiency throughput({n_hi}) / "
                f"({n_hi // n_lo} x throughput({n_lo})) = **{eff:.3f}**\n"
            )
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
