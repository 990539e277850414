"""Tests for the single-pass data-quality gates (operators/dataquality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def _dirty(spark):
    rows = [
        (1, "alpha", "en", 10.0),
        (2, "beta", "en", 20.0),
        (2, "beta", "de", -5.0),      # dup id, negative value
        (4, None, "xx", 30.0),        # null text, bad lang
        (None, "gamma", "en", None),  # null id, null value
    ]
    return spark.createDataFrame(
        rows, "id long, text string, lang string, value double"
    )


class TestProfileColumns:
    def test_counts_and_extrema(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            profile_columns,
        )

        prof = {
            r["column"]: r
            for r in profile_columns(_dirty(spark)).collect()
        }
        assert set(prof) == {"id", "text", "lang", "value"}
        assert all(r["n_rows"] == 5 for r in prof.values())
        assert prof["id"]["n_null"] == 1
        assert prof["id"]["n_distinct"] == 3  # 1, 2, 4
        assert prof["id"]["null_rate"] == 0.2
        assert prof["text"]["min_value"] == "alpha"
        assert prof["text"]["max_value"] == "gamma"
        assert prof["value"]["min_value"] == "-5.0"

    def test_single_scan(self, spark):
        """all columns profile in ONE pass over the input"""
        from featurescreening_jl_spark.operators.dataquality import (
            profile_columns,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = profile_columns(docs, ["doc_id", "lang"], approx=True)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert p.count("FileScan") == 1, p

    def test_approx_close_to_exact(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            profile_columns,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        exact = {
            r["column"]: r["n_distinct"]
            for r in profile_columns(docs, ["doc_id", "source"]).collect()
        }
        approx = {
            r["column"]: r["n_distinct"]
            for r in profile_columns(
                docs, ["doc_id", "source"], approx=True
            ).collect()
        }
        for c in exact:
            assert abs(approx[c] - exact[c]) <= max(3, 0.05 * exact[c]), c

    def test_rejects_unknown_column(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            profile_columns,
        )

        with pytest.raises(ValueError, match="unknown columns"):
            profile_columns(_dirty(spark), ["nope"])


class TestCheckConstraints:
    def test_verdicts(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            check_constraints,
        )

        out = check_constraints(
            _dirty(spark),
            [
                ("not_null", "id"),
                ("unique", "id"),
                ("in_range", "value", 0.0, 100.0),
                ("allowed", "lang", ["en", "de"]),
                ("matches", "text", "^[a-z]+$"),
            ],
        ).collect()
        got = {(r["check"], r["column"]): (r["violations"], r["passed"])
               for r in out}
        assert got[("not_null", "id")] == (1, False)
        assert got[("unique", "id")] == (1, False)       # id=2 twice
        assert got[("in_range", "value")] == (1, False)  # -5.0
        assert got[("allowed", "lang")] == (1, False)    # xx
        assert got[("matches", "text")] == (0, True)     # NULL skipped

    def test_all_pass_on_clean_data(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            check_constraints,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = check_constraints(
            docs,
            [("not_null", "doc_id"), ("unique", "doc_id"),
             ("matches", "source", "^src[0-9]+$")],
        ).collect()
        assert all(r["passed"] for r in out)
        assert [r["check"] for r in out] == ["not_null", "unique", "matches"]

    def test_single_scan(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            check_constraints,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = check_constraints(
            docs, [("not_null", "doc_id"), ("in_range", "n_chars", 0, 10**6)]
        )
        p = out._jdf.queryExecution().executedPlan().toString()
        assert p.count("FileScan") == 1, p

    def test_rejects_bad_specs(self, spark):
        from featurescreening_jl_spark.operators.dataquality import (
            check_constraints,
        )

        df = _dirty(spark)
        with pytest.raises(ValueError, match="no constraints"):
            check_constraints(df, [])
        with pytest.raises(ValueError, match="unknown column"):
            check_constraints(df, [("not_null", "nope")])
        with pytest.raises(ValueError, match="unknown constraint kind"):
            check_constraints(df, [("bogus", "id")])
