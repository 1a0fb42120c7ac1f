"""HWE exact test — expectations from the reference suite
(tests/qc/test_variant_qc.py:287-353, values cross-checked against
PLINK 2.0 --hardy per the reference docstring)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.hwe import hwe_exact_test, hwe_pvalue_py


class TestScalar:
    def test_perfect_hwe(self):
        assert hwe_pvalue_py(50, 25, 25) == pytest.approx(1.0, abs=0.01)

    def test_excess_heterozygotes(self):
        assert hwe_pvalue_py(80, 10, 10) < 0.001

    def test_deficit_heterozygotes(self):
        assert hwe_pvalue_py(10, 45, 45) < 0.001

    def test_rare_variant(self):
        assert 0.0 <= hwe_pvalue_py(20, 80, 0) <= 1.0

    def test_excess_het_rare(self):
        assert hwe_pvalue_py(100, 400, 0) < 0.05

    def test_all_hom_ref(self):
        assert hwe_pvalue_py(0, 100, 0) == 1.0

    def test_all_hom_alt(self):
        assert hwe_pvalue_py(0, 0, 100) == 1.0

    def test_small_sample(self):
        assert 0.0 <= hwe_pvalue_py(2, 3, 1) <= 1.0

    def test_zero_samples(self):
        assert math.isnan(hwe_pvalue_py(0, 0, 0))

    def test_all_het(self):
        # n_a == n_b == n_het: extreme excess heterozygosity, valid p
        p = hwe_pvalue_py(10, 0, 0)
        assert 0.0 <= p <= 1.0


def test_pandas_udf_matches_scalar(spark):
    cases = [
        (50, 25, 25),
        (80, 10, 10),
        (10, 45, 45),
        (20, 80, 0),
        (100, 400, 0),
        (0, 100, 0),
        (0, 0, 100),
        (2, 3, 1),
        (0, 0, 0),
        (57, 14, 50),  # Wigginton's worked example
    ]
    df = spark.createDataFrame(cases, ["n_het", "n_hom_ref", "n_hom_alt"])
    rows = df.select(
        "*",
        hwe_exact_test(
            F.col("n_het"), F.col("n_hom_ref"), F.col("n_hom_alt")
        ).alias("p"),
    ).collect()
    for r in rows:
        expected = hwe_pvalue_py(r.n_het, r.n_hom_ref, r.n_hom_alt)
        if math.isnan(expected):
            # NaN crosses the Arrow boundary as NULL (see hwe.py docstring)
            assert r.p is None
        else:
            assert r.p == pytest.approx(expected, rel=1e-12)
