"""Two-parallelism scaling benchmark — the sandbox proxy for N vs 4N
executor clusters (BASELINE.json north_rule: scaling efficiency ≥ 0.8).

Runs the IDENTICAL featurize→screen job on the IDENTICAL transcripts input
at local[8] and local[32] (one fresh JVM per run via subprocess), reports
turns/sec at both and efficiency = throughput(4N) / (4 × throughput(N)).

Methodology notes (they matter in this sandbox):
- the host shows intermittent CPU steal from co-tenants, so reps are
  INTERLEAVED across parallelism levels (A/B/A/B…) and both median and min
  are reported — min is the cleanest capability estimate when the only
  noise source is additive interference;
- the screening rounds use the engine's ``partitioned`` importance backend
  (operators/importance_dist.py): map-only per-partition tree training
  with additive split counts. The MLlib backend is Amdahl-capped ~0.6
  efficiency by driver-side split selection; the partitioned backend is
  the designed scale-out path and ~10× faster per round on this workload.

Usage:
    python tools/bench_scaling.py [--convs 300000] [--reps 3] [--write-md]
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
        config={{"n_trees": 128, "max_depth": 8, "min_samples_leaf": 10,
                 "min_purity_increase": 0.0}},
        rng=42, show_progress=False,
        importance_backend="partitioned",
        backend_options={{"num_partitions": 64}},
    )
    result.df.write.format("noop").mode("overwrite").save()

run_once()  # warm-up: JIT, codegen, page cache
t0 = time.perf_counter()
run_once()
dt = time.perf_counter() - t0
spark.stop()
print("RESULT " + json.dumps({{"parallelism": parallelism,
                               "n_turns": n_turns, "time": dt}}))
"""

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from featurescreening_jl_spark.plans.session import get_spark
from featurescreening_jl_spark.sources.transcripts import synthetic_transcripts
spark = get_spark("bench-gen", parallelism=32)
spark.sparkContext.setLogLevel("ERROR")
df = synthetic_transcripts(spark, {convs}, seed=42)
df.repartition(128).write.mode("overwrite").parquet({data!r})
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
    ap.add_argument("--convs", type=int, default=300000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--write-md", action="store_true")
    ap.add_argument("--keep-data", action="store_true")
    args = ap.parse_args()

    data = os.path.join(TMP, "transcripts_scaling")
    os.makedirs(TMP, exist_ok=True)
    if not os.path.isdir(data):
        print(f"generating {args.convs} conversations …", flush=True)
        run_py(GEN.format(repo=REPO, convs=args.convs, data=data))

    times: dict[int, list[float]] = {p: [] for p in args.levels}
    n_turns = None
    # interleave levels to average out time-varying host interference
    for rep in range(args.reps):
        for p in args.levels:
            print(f"rep {rep + 1}/{args.reps} at local[{p}] …", flush=True)
            out = run_py(WORKER.format(repo=REPO, parallelism=p, data=data))
            line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
            res = json.loads(line[len("RESULT "):])
            n_turns = res["n_turns"]
            times[p].append(res["time"])

    n_lo, n_hi = args.levels
    med = {p: statistics.median(times[p]) for p in args.levels}
    best = {p: min(times[p]) for p in args.levels}
    thr_med = {p: n_turns / med[p] for p in args.levels}
    thr_best = {p: n_turns / best[p] for p in args.levels}
    ratio = n_hi / n_lo
    eff_med = thr_med[n_hi] / (ratio * thr_med[n_lo])
    eff_best = thr_best[n_hi] / (ratio * thr_best[n_lo])
    summary = {
        "n_turns": n_turns,
        "median_sec": {str(p): round(med[p], 2) for p in args.levels},
        "min_sec": {str(p): round(best[p], 2) for p in args.levels},
        "turns_per_sec_median": {str(p): round(thr_med[p], 1) for p in args.levels},
        "turns_per_sec_best": {str(p): round(thr_best[p], 1) for p in args.levels},
        "scaling_efficiency_median": round(eff_med, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "levels": args.levels,
        "reps": args.reps,
        "all_times": {str(p): [round(t, 2) for t in times[p]]
                      for p in args.levels},
    }
    print(json.dumps(summary))

    if args.write_md:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        path = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(path, "a") as fh:
            fh.write(
                f"\n## Scaling run (featurize→screen, partitioned backend, "
                f"{n_turns} turns, {args.reps} interleaved reps)\n\n"
                f"| parallelism | median sec | min sec | turns/sec (median) "
                f"| turns/sec (best) |\n|---|---|---|---|---|\n"
            )
            for p in args.levels:
                fh.write(
                    f"| local[{p}] | {med[p]:.2f} | {best[p]:.2f} "
                    f"| {thr_med[p]:.1f} | {thr_best[p]:.1f} |\n"
                )
            fh.write(
                f"\nscaling efficiency throughput({n_hi}) / "
                f"({int(ratio)} × throughput({n_lo})): "
                f"median **{eff_med:.3f}**, best-rep **{eff_best:.3f}**\n"
                f"\n(interleaved reps; the host shows intermittent CPU "
                f"steal, so the min/best estimate is the cleaner capability "
                f"number — interference is strictly additive.)\n"
            )
    if not args.keep_data:
        shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
