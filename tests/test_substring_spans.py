"""Unit semantics for span-level exact substring dedup
(operators/substring_spans.py) — hand-built corpora with
pen-and-paper expected coverage, including the overlapping-gram merge
and the cross-doc-only mode. The DuckDB value oracle runs in
tests/test_oracles_all.py; these pin the SEMANTICS on adversarial
micro-inputs the synthetic corpus can't guarantee to contain."""

from __future__ import annotations

import pytest

from featurescreening_jl_spark.operators.substring_spans import (
    duplicated_spans,
)

pytestmark = pytest.mark.spark

# k=5 corpus: "abcde" repeats within A and across A/B; "qqqqq" repeats
# only WITHIN C; "wwwww" overlaps itself in D; E is shorter than k; F is
# empty.
DOCS = [
    (1, "abcdeXXXXXabcde"),  # "abcde" at pos 1 and 11
    (2, "zzabcdezz"),  # "abcde" at pos 3
    (3, "qqqqq-qqqqq"),  # "qqqqq" at pos 1 and 7 (within-doc only)
    (4, "wwwwww"),  # "wwwww" at pos 1 AND 2 — overlapping spans
    (5, "abc"),  # shorter than k
    (6, ""),  # empty
]


def _run(spark, **kw):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = duplicated_spans(docs, k=5, **kw).collect()
    return {r["doc_id"]: r for r in rows}


class TestDuplicatedSpans:
    def test_counts_and_merged_coverage(self, spark):
        out = _run(spark)
        assert set(out) == {1, 2, 3, 4, 5, 6}  # every doc kept, no join
        # A: two disjoint 5-char spans
        assert (out[1]["dup_chars"], out[1]["n_chars"]) == (10, 15)
        # B: one span (count includes A's occurrences)
        assert out[2]["dup_chars"] == 5
        # C: within-doc repeat counts in the default mode
        assert out[3]["dup_chars"] == 10
        # D: overlapping positions 1,2 merge to 6 covered chars, not 10
        assert (out[4]["dup_chars"], out[4]["n_chars"]) == (6, 6)
        assert out[4]["dup_fraction"] == 1.0
        # short/empty docs: zero coverage, no divide-by-zero
        assert (out[5]["dup_chars"], out[5]["dup_fraction"]) == (0, 0.0)
        assert (out[6]["n_chars"], out[6]["dup_fraction"]) == (0, 0.0)

    def test_cross_doc_only_excludes_self_repeats(self, spark):
        out = _run(spark, cross_doc_only=True)
        # "abcde" is cross-doc (A, B): still counted, incl. A's repeat
        assert out[1]["dup_chars"] == 10
        assert out[2]["dup_chars"] == 5
        # "qqqqq" (C) and "wwwww" (D) repeat only within one doc
        assert out[3]["dup_chars"] == 0
        assert out[4]["dup_chars"] == 0

    def test_min_count_threshold(self, spark):
        out = _run(spark, min_count=3)
        # only "abcde" occurs 3x; "qqqqq"/"wwwww" (2x) fall below
        assert out[1]["dup_chars"] == 10
        assert out[2]["dup_chars"] == 5
        assert out[3]["dup_chars"] == 0
        assert out[4]["dup_chars"] == 0

    def test_validation(self, spark):
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        with pytest.raises(ValueError):
            duplicated_spans(docs, k=0)
        with pytest.raises(ValueError):
            duplicated_spans(docs, k=5, min_count=1)
