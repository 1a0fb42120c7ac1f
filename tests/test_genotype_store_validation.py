"""Genotype store layout, store query surface, CHECK-constraint
validation, CLI score command."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.vcf_fixtures import write_vcf
from vcf_pg_loader_spark.plans.validation import (
    GENOTYPE_CHECKS,
    VARIANT_CHECKS,
    validate,
)
from vcf_pg_loader_spark.sources.genotype_store import (
    GenotypeStore,
    with_genotype_columns,
)
from vcf_pg_loader_spark.sources.vcf import read_genotypes


@pytest.fixture(scope="module")
def geno_vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("geno")
    rows = [
        "chr1\t100\trs1\tA\tG\t50.0\tPASS\tDP=30\tGT:GQ:DP:AD:DS:GP\t"
        "0/1:99:30:15,15:1.1:0.1,0.8,0.1\t0/0:80:25:25,0:0.0:0.9,0.1,0.0",
        "chr1\t200\trs2\tT\tC\t60.0\tPASS\tDP=20\tGT:GQ\t1/1:55\t0/1:12",
    ]
    return write_vcf(str(d / "g.vcf"), rows, samples=["s1", "s2"])


class TestGenotypeStore:
    def test_write_read_bucketed(self, spark, tmp_path, geno_vcf):
        gts = read_genotypes(spark, geno_vcf).withColumn(
            "alt", F.element_at("alts", 1)
        ).drop("alts")
        store = GenotypeStore(spark, str(tmp_path / "root"), n_buckets=4)
        store.write(gts)
        back = store.read()
        assert back.count() == 4
        assert "sample_bucket" in back.columns
        # derived columns present
        row = back.filter(
            (F.col("sample_id") == "s1") & (F.col("pos") == 100)
        ).collect()[0]
        assert row.dosage == pytest.approx(1.1)  # DS wins
        assert row.allele_balance == pytest.approx(0.5)
        assert row.passes_adj is True
        # ADJ fails on low GQ
        low = back.filter(
            (F.col("sample_id") == "s2") & (F.col("pos") == 200)
        ).collect()[0]
        assert low.passes_adj is False

    def test_for_sample_prunes(self, spark, tmp_path, geno_vcf):
        gts = read_genotypes(spark, geno_vcf).withColumn(
            "alt", F.element_at("alts", 1)
        ).drop("alts")
        store = GenotypeStore(spark, str(tmp_path / "root2"), n_buckets=4)
        store.write(gts)
        s1 = store.for_sample("s1")
        assert s1.count() == 2
        assert {r.sample_id for r in s1.collect()} == {"s1"}

    def test_stats(self, spark, tmp_path, geno_vcf):
        gts = read_genotypes(spark, geno_vcf).withColumn(
            "alt", F.element_at("alts", 1)
        ).drop("alts")
        store = GenotypeStore(spark, str(tmp_path / "root3"))
        store.write(gts)
        s = store.stats().collect()[0]
        assert s.n_genotypes == 4 and s.n_samples == 2


class TestStoreQuerySurface:
    def test_region_and_lookup(self, spark, tmp_path, geno_vcf):
        from vcf_pg_loader_spark.sources.store import VariantStore
        from vcf_pg_loader_spark.sources.vcf import read_vcf

        store = VariantStore(spark, str(tmp_path / "vstore"))
        store.load(read_vcf(spark, geno_vcf), geno_vcf)
        assert store.query_region("chr1", 50, 150).count() == 1
        assert store.lookup_variant("chr1", 200).count() == 1
        assert store.lookup_rsid("rs2").collect()[0].pos == 200
        stats = {r.chrom: r for r in store.partition_stats().collect()}
        assert stats["chr1"].n_rows == 2


class TestValidation:
    def test_valid_frame_passes(self, spark):
        df = spark.createDataFrame(
            [(100, 0.99, 0.2, 0.2, 0.5, 0.9)],
            "pos long, call_rate double, aaf double, maf double, "
            "hwe_p double, info_score double",
        )
        valid, report = validate(df, VARIANT_CHECKS)
        assert report.ok and report.violations == {}
        assert valid.count() == 1

    def test_violations_counted_and_filtered(self, spark):
        df = spark.createDataFrame(
            [(100, 1.5, 0.2), (-5, 0.9, 0.7), (200, None, 0.3)],
            "pos long, call_rate double, maf double",
        )
        valid, report = validate(df, VARIANT_CHECKS)
        assert report.n_total == 3
        assert report.violations["call_rate_range"] == 1
        assert report.violations["pos_positive"] == 1
        assert report.violations["maf_range"] == 1
        assert valid.count() == 1  # only (200, None, 0.3) survives
        assert not report.ok

    def test_genotype_checks(self, spark):
        df = spark.createDataFrame(
            [(0.5, 0.3, 99, 30), (2.5, 0.3, 99, 30)],
            "dosage double, allele_balance double, gq int, dp int",
        )
        valid, report = validate(df, GENOTYPE_CHECKS)
        assert report.violations == {"dosage_range": 1}
        assert valid.count() == 1


def test_cli_score(spark, tmp_path, geno_vcf, capsys):
    from vcf_pg_loader_spark.cli import main

    store = str(tmp_path / "score_store")
    weights = spark.createDataFrame(
        [("1", 100, "G", 0.5), ("1", 200, "C", -1.0)],
        ["chrom", "pos", "effect_allele", "effect_weight"],
    )
    weights.write.parquet(f"{store}/prs_weights")
    assert main(["score", geno_vcf, "--store", store]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    by_sample = {r["sample_id"]: r for r in lines}
    # s1: dosage 1.1 (DS) * 0.5 + (1/1 -> 2) * -1.0 = -1.45
    assert by_sample["s1"]["prs_raw"] == pytest.approx(1.1 * 0.5 - 2.0)
    # s2: 0.0 * 0.5 + 1 * -1.0
    assert by_sample["s2"]["prs_raw"] == pytest.approx(-1.0)
