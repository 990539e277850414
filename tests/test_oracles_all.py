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


@pytest.mark.slow
@pytest.mark.spark
def test_every_query_matches_its_oracle_at_sf001():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), SF_DIR],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-80:])
    assert proc.returncode == 0, f"oracle gate failed:\n{tail}\n{proc.stderr[-2000:]}"
