"""Variant/sample QC aggregations vs reference semantics
(qc/variant_qc.py, qc/sample_qc.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.qc.sample_qc import sample_qc
from vcf_pg_loader_spark.qc.variant_qc import (
    classify_gt,
    genotype_counts,
    variant_qc,
    with_allele_frequencies,
)


def _gt_frame(spark, gts, chrom="chr1", pos=100, ref="A", alt="G"):
    return spark.createDataFrame(
        [(chrom, pos, ref, alt, f"s{i}", gt) for i, gt in enumerate(gts)],
        ["chrom", "pos", "ref", "alt", "sample_id", "gt"],
    )


class TestClassifyGT:
    CASES = [
        ("0/0", "hom_ref"),
        ("0|0", "hom_ref"),
        ("0/1", "het"),
        ("1|0", "het"),
        ("1/1", "hom_alt"),
        ("2/2", "hom_alt"),
        ("1/2", "het"),
        ("./.", None),
        (".|.", None),
        (".", None),
        ("./1", None),  # half-missing -> not counted (variant_qc.py:50-54)
        ("0", "hom_ref"),  # haploid
        ("1", "hom_alt"),
        ("abc", None),
    ]

    @pytest.mark.parametrize("gt,expected", CASES)
    def test_classify(self, spark, gt, expected):
        got = (
            spark.createDataFrame([(gt,)], ["gt"])
            .select(classify_gt(F.col("gt")).alias("c"))
            .collect()[0]
            .c
        )
        assert got == expected


def test_genotype_counts(spark):
    # same inputs as reference TestCallRate / compute_genotype_counts
    df = _gt_frame(spark, ["0/0", "0/1", "1/1", "0/0", "./.", "0|1"])
    row = genotype_counts(df).collect()[0]
    assert (row.n_called, row.n_het, row.n_hom_ref, row.n_hom_alt) == (5, 2, 2, 1)


def test_allele_frequencies(spark):
    df = _gt_frame(spark, ["0/0", "0/1", "1/1", "0/1"])
    row = with_allele_frequencies(genotype_counts(df)).collect()[0]
    # AC_alt = 2*1+2 = 4, AN = 8 -> aaf 0.5, maf 0.5, mac min(4,4)=4
    assert row.aaf == pytest.approx(0.5)
    assert row.maf == pytest.approx(0.5)
    assert row.mac == 4
    assert row.call_rate == pytest.approx(1.0)


def test_variant_qc_hwe(spark):
    gts = ["0/1"] * 50 + ["0/0"] * 25 + ["1/1"] * 25
    row = variant_qc(_gt_frame(spark, gts)).collect()[0]
    assert row.hwe_p == pytest.approx(1.0, abs=0.01)

    gts = ["0/1"] * 80 + ["0/0"] * 10 + ["1/1"] * 10
    row = variant_qc(_gt_frame(spark, gts)).collect()[0]
    assert row.hwe_p < 0.001


def test_variant_qc_no_calls(spark):
    row = variant_qc(_gt_frame(spark, ["./.", "./."])).collect()[0]
    assert row.n_called == 0
    assert row.aaf is None
    assert row.hwe_p is None  # NaN -> NULL across Arrow (hwe.py docstring)


def test_sample_qc_rollup(spark):
    rows = []
    # sample s0: all called, one het snp (transition A->G), one hom_alt
    # indel; s1: one missing
    data = [
        ("chr1", 100, "A", "G", "s0", "0/1", 30, 99),
        ("chr1", 200, "AT", "A", "s0", "1/1", 20, 80),
        ("chr1", 100, "A", "G", "s1", "./.", None, None),
        ("chr1", 200, "AT", "A", "s1", "0/0", 25, 70),
    ]
    df = spark.createDataFrame(
        data, ["chrom", "pos", "ref", "alt", "sample_id", "gt", "dp", "gq"]
    )
    out = {r.sample_id: r for r in sample_qc(df).collect()}
    s0, s1 = out["s0"], out["s1"]
    assert s0.call_rate == pytest.approx(1.0)
    assert s0.n_het == 1 and s0.n_hom_var == 1
    assert s0.het_hom_ratio == pytest.approx(1.0)
    assert s0.n_transitions == 1 and s0.n_transversions == 0
    assert s0.ti_tv_ratio is None  # no transversions -> None
    assert s0.mean_dp == pytest.approx(25.0)
    assert s1.call_rate == pytest.approx(0.5)
    assert s1.qc_pass is False  # 0.5 < 0.99


def test_sample_qc_sex_inference(spark):
    # s_male: 0 het on X; s_female: high X het
    data = []
    for i in range(20):
        pos = 3_000_000 + i
        data.append(("chrX", pos, "A", "G", "s_male", "1/1"))
        data.append(("chrX", pos, "A", "G", "s_female", "0/1"))
    df = spark.createDataFrame(
        data, ["chrom", "pos", "ref", "alt", "sample_id", "gt"]
    )
    out = {r.sample_id: r for r in sample_qc(df).collect()}
    assert out["s_male"].sex_inferred == "M"
    assert out["s_female"].sex_inferred == "F"
