"""Scalar genomics functions vs the reference's Python twins
(validation/sql_functions.py:230-305, gwas/loader.py:68-111)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions import genomics as G


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


class TestAllelesMatch:
    CASES = [
        # exact / swap / strand flip / flip+swap / none
        ("A", "G", "A", "G", True),
        ("A", "G", "G", "A", True),
        ("A", "G", "T", "C", True),
        ("A", "G", "C", "T", True),
        ("A", "G", "A", "C", False),
        ("AT", "A", "AT", "A", True),
        ("a", "g", "A", "G", True),  # case-insensitive
    ]

    @pytest.mark.parametrize("r1,a1,r2,a2,expected", CASES)
    def test_match(self, spark, r1, a1, r2, a2, expected):
        got = _one(
            spark, G.alleles_match(F.lit(r1), F.lit(a1), F.lit(r2), F.lit(a2))
        )
        assert got is expected

    def test_null_propagates(self, spark):
        got = _one(
            spark,
            G.alleles_match(
                F.lit(None).cast("string"), F.lit("G"), F.lit("A"), F.lit("G")
            ),
        )
        assert got is None


def test_n_eff(spark):
    assert _one(spark, G.n_eff(F.lit(100), F.lit(100))) == 200.0
    assert _one(spark, G.n_eff(F.lit(0), F.lit(100))) is None
    assert _one(spark, G.n_eff(F.lit(300), F.lit(100))) == 300.0


def test_af_from_dosages(spark):
    col = G.af_from_dosages(
        F.array(F.lit(0.0), F.lit(1.0), F.lit(2.0), F.lit(None).cast("double"))
    )
    assert _one(spark, col) == pytest.approx(0.5)
    assert _one(spark, G.af_from_dosages(F.array().cast("array<double>"))) is None


def test_gt_to_dosage(spark):
    for gt, expected in [
        ("0/0", 0.0),
        ("0/1", 1.0),
        ("1|0", 1.0),
        ("1/1", 2.0),
        ("./.", None),
        ("1/2", None),
    ]:
        assert _one(spark, G.gt_to_dosage(F.lit(gt))) == expected


def test_dosage_from_gp(spark):
    col = G.dosage_from_gp(F.array(F.lit(0.1), F.lit(0.2), F.lit(0.7)))
    assert _one(spark, col) == pytest.approx(0.2 + 2 * 0.7)


def test_allele_balance(spark):
    col = G.allele_balance(F.array(F.lit(15), F.lit(5)))
    assert _one(spark, col) == pytest.approx(0.25)
    assert _one(spark, G.allele_balance(F.array(F.lit(0), F.lit(0)))) is None


def test_strand_ambiguous(spark):
    assert _one(spark, G.is_strand_ambiguous(F.lit("A"), F.lit("T"))) is True
    assert _one(spark, G.is_strand_ambiguous(F.lit("C"), F.lit("G"))) is True
    assert _one(spark, G.is_strand_ambiguous(F.lit("A"), F.lit("G"))) is False


def test_complement(spark):
    assert _one(spark, G.complement(F.lit("acgt"))) == "TGCA"


def test_is_transition(spark):
    assert _one(spark, G.is_transition(F.lit("A"), F.lit("G"))) is True
    assert _one(spark, G.is_transition(F.lit("A"), F.lit("C"))) is False


def test_chrom_sort_key(spark):
    rows = (
        spark.createDataFrame(
            [("chr2",), ("chr10",), ("1",), ("chrX",), ("chrM",), ("weird",)],
            ["chrom"],
        )
        .select("chrom", G.chrom_sort_key(F.col("chrom")).alias("k"))
        .collect()
    )
    keys = {r.chrom: r.k for r in rows}
    assert keys["1"] == 0  # bare names canonicalize
    assert keys["chr2"] == 1
    assert keys["chr10"] == 9
    assert keys["chrX"] == 22
    assert keys["chrM"] == 24
    assert keys["weird"] == 99


def test_worst_impact(spark):
    col = G.worst_impact(F.array(F.lit("LOW"), F.lit("HIGH"), F.lit("MODERATE")))
    assert _one(spark, col) == "HIGH"


def test_sql_registration(spark):
    G.register_sql_functions(spark)
    row = spark.sql(
        "SELECT alleles_match('A','G','T','C') AS m, n_eff(100,100) AS n, "
        "af_from_dosages(array(0.0,1.0,2.0)) AS af, "
        "hwe_exact_test_scalar(50,25,25) AS hp"
    ).collect()[0]
    assert row.m is True
    assert row.n == 200.0
    assert row.af == pytest.approx(0.5)
    assert row.hp == pytest.approx(1.0, abs=0.01)


class TestClinvarNormalization:
    """Vectors ported from reference tests/test_type_mapping.py plus the
    compound/quirk cases of type_mapping.py:106-138."""

    VECTORS = [
        ("Pathogenic", "pathogenic"),
        ("Likely_pathogenic", "likely_pathogenic"),
        ("Benign", "benign"),
        ("Likely_benign", "likely_benign"),
        ("Uncertain_significance", "vus"),
        ("Conflicting_interpretations_of_pathogenicity", "conflicting"),
        ("Benign,Pathogenic", "pathogenic"),
        ("Uncertain_significance/Pathogenic", "pathogenic"),
        ("Benign,Likely_pathogenic", "likely_pathogenic"),
        ("", "not_provided"),
        (None, "not_provided"),
        ("drug_response", "drug_response"),
        ("risk_factor", "risk_factor"),
        # unmapped tokens lower-case through
        ("Affects", "affects"),
        # reference quirk: benign suppressed when any token CONTAINS
        # 'pathogenic' (substring test over the list repr)
        ("Benign,Pathogenic_low_penetrance", "benign_or_not"),
    ]

    def test_vectors(self, spark):
        from vcf_pg_loader_spark.functions.genomics import normalize_clinvar_sig

        rows = [(i, v) for i, (v, _) in enumerate(self.VECTORS)]
        df = spark.createDataFrame(rows, "id int, raw string")
        got = {
            r.id: r.norm
            for r in df.select(
                "id", normalize_clinvar_sig(F.col("raw")).alias("norm")
            ).collect()
        }
        for i, (raw, want) in enumerate(self.VECTORS):
            if want == "benign_or_not":
                continue
            assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"

    def test_benign_suppressed_by_pathogenic_substring(self, spark):
        """Python-twin check of the reference's str(list) containment
        quirk: 'Benign,Pathogenic_low_penetrance' must NOT normalize to
        benign (falls through to the first token)."""
        from vcf_pg_loader_spark.functions.genomics import normalize_clinvar_sig

        df = spark.createDataFrame(
            [(1, "Benign,Pathogenic_low_penetrance")], "id int, raw string"
        )
        out = df.select(normalize_clinvar_sig(F.col("raw")).alias("n")).collect()[0].n
        assert out == "benign"  # first token after fallthrough

    def test_scan_applies_normalization(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.vcf import read_vcf

        p = tmp_path / "clnsig.vcf"
        p.write_text(
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=CLNSIG,Number=.,Type=String,Description="sig">\n'
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
            "chr1\t100\t.\tA\tG\t50\tPASS\tCLNSIG=Benign/Pathogenic\n"
            "chr1\t200\t.\tC\tT\t50\tPASS\tDP=3\n"
        )
        rows = {r.pos: r for r in read_vcf(spark, str(p)).collect()}
        assert rows[100].clinvar_sig == "pathogenic"
        assert rows[100].clinvar_sig_raw == "Benign/Pathogenic"
        assert rows[200].clinvar_sig is None  # absent stays NULL
