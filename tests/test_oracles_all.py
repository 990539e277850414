"""Continuous local replica of the driver's correctness gate.

The driver samples the `queries()` surface per round (round 3 covered only
50 of 65 entries), so this test is the only CONTINUOUS gate over every
oracle: it runs `tools/check_correctness.py` — every `queries()` entry on
Spark vs its `oracle_sql()` on DuckDB at sf0.01, comparing row count,
column names, and order-insensitive values — and fails on any mismatch.

Runs in a subprocess so its SparkSession doesn't collide with the
session-scoped fixture; marked slow (~10 min on a busy host).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


SF01_DIR = "/root/testdata/sf0.1"

# The float-pow/log/exp/sqrt oracle families: these are where a
# transcendental-libm or summation-order divergence between Spark and
# DuckDB would grow with data volume, so sf0.01 agreement alone is the
# weakest evidence for them. Round 4 hand-checked its new queries at
# sf0.1; this list makes that continuous (round-4 verdict task 4).
POW_HEAVY = [
    "lm_score",            # log-prob sums
    "perplexity_buckets",  # exp of mean log-prob
    "quality_score",       # sigmoid (exp)
    "quality_classifier_score",  # sigmoid over frozen coefficients
    "dsir_weights",        # log-likelihood ratios
    "psi_drift",           # ln(actual/expected)
    "ks_drift",            # cumulative-fraction arithmetic
    "embedding_drift",     # sqrt + fp-grid sums
    "feature_corr",        # sqrt of covariance products
    "chi2_ranking",        # squared-deviation ratios
    "bm25",                # idf logs + saturation division
    "tfidf_top_terms",     # idf logs
    "entropy_features",    # p*log2(p) sums
    "calibration",         # probability-bucket means
]


def _run_gate(sf_dir: str, names: list[str] | None = None) -> None:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check_correctness.py"),
            sf_dir,
            *(names or []),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-80:])
    assert proc.returncode == 0, f"oracle gate failed:\n{tail}\n{proc.stderr[-2000:]}"


@pytest.mark.slow
@pytest.mark.spark
def test_every_query_matches_its_oracle_at_sf001():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    _run_gate(SF_DIR)


@pytest.mark.slow
@pytest.mark.spark
def test_pow_heavy_oracles_match_at_sf01():
    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"{SF01_DIR} not present")
    _run_gate(SF01_DIR, POW_HEAVY)


# Oracles whose DuckDB formulations are DELIBERATELY quadratic or
# recursive in input size (exact all-pairs Jaccard, recursive-CTE
# connected components, naive BETWEEN range join, per-position gram
# windows, unrolled iterative CTE chains): affordable by design at
# sf0.01 only — a full-surface sf0.1 attempt spent 94 CPU-minutes
# inside DuckDB before being killed (round 5), and their comparisons
# are all-integer/string, so agreement does not drift with volume.
QUADRATIC_ORACLES = {
    "conv_neardup", "ngram_jaccard", "ngram_jaccard_indexed",
    "minhash_pairs", "minhash_incremental", "winnow_pairs",
    "simhash_neardup", "cosine_neardup", "semantic_dedup", "dedup_cc",
    "dedup_cc_star", "dedup_cluster_sizes", "keep_best", "soft_dedup",
    "leakage_split", "corpus_prep", "fuzzy_join", "range_join",
    "substring_spans", "cosine_topk", "lsh_topk", "ivf_topk",
    "pq_topk", "screen_pipeline", "turn_edit_dist", "contamination",
    "contamination_bitmap", "winnow_fingerprints", "simhash_dedup",
    "doc_pagerank", "kmeans_cells", "label_propagation", "curriculum",
}


@pytest.mark.slow
@pytest.mark.spark
def test_linear_oracles_match_at_sf01():
    """The full linear-oracle sweep at sf0.1 (~105 queries, ~17 min) —
    opt-in via SPARK_GRAFT_SF01_FULL=1 so the default suite stays under
    ~20 min; last run green 105/105 (round 5, recorded in
    BENCH/BASELINE.md)."""
    if not os.environ.get("SPARK_GRAFT_SF01_FULL"):
        pytest.skip("set SPARK_GRAFT_SF01_FULL=1 to run the ~17 min sweep")
    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"{SF01_DIR} not present")
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    linear = sorted(set(entrymod.oracle_sql()) - QUADRATIC_ORACLES)
    _run_gate(SF01_DIR, linear)
