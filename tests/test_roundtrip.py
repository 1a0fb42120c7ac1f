"""Round-trip integrity: parse → store → read-back equality, including
INFO fields, multiallelics, and normalization coordinates — the
reference's tests/validation/test_roundtrip.py:14-289 strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.vcf_fixtures import write_vcf
from vcf_pg_loader_spark.sources.store import VariantStore
from vcf_pg_loader_spark.sources.vcf import read_vcf


@pytest.fixture(scope="module")
def roundtrip_vcf(tmp_path_factory):
    d = tmp_path_factory.mktemp("rt")
    rows = [
        "chr1\t100\trs1\tA\tG\t50.5\tPASS\tDP=30;AF=0.5;AC=1;DB",
        "chr1\t200\t.\tT\tC,G\t.\tLowQual\tDP=20;AF=0.3,0.1;AC=3,1;AD=10,6,4",
        "chr2\t300\trs3\tATT\tAT\t99.0\tPASS\tDP=15;AF=0.2",
        "chrX\t400\trs4\tG\tGAA\t70.0\tq10\tDP=9",
    ]
    return write_vcf(str(d / "rt.vcf"), rows)


def test_roundtrip_equality(spark, tmp_path, roundtrip_vcf):
    parsed = read_vcf(spark, roundtrip_vcf, normalize=True)
    store = VariantStore(spark, str(tmp_path / "rt_store"))
    store.load(parsed, roundtrip_vcf)
    back = store.read()

    key = ["chrom", "pos", "ref", "alt"]
    a = {tuple(r[k] for k in key): r for r in parsed.collect()}
    b = {tuple(r[k] for k in key): r for r in back.collect()}
    assert set(a) == set(b)
    for k in a:
        for col in (
            "qual", "filter", "rs_id", "variant_type", "end_pos",
            "normalized", "original_pos", "original_ref", "original_alt",
            "info_score", "alt_idx",
        ):
            assert a[k][col] == b[k][col], (k, col)
        # INFO map survives parquet round trip exactly
        assert dict(a[k]["info"] or {}) == dict(b[k]["info"] or {})


def test_roundtrip_multiallelic_decomposition_counts(spark, tmp_path, roundtrip_vcf):
    parsed = read_vcf(spark, roundtrip_vcf)
    # 4 input rows, one has 2 ALTs -> 5 decomposed records
    assert parsed.count() == 5
    per_site = (
        parsed.groupBy("chrom", "pos").count().orderBy("chrom", "pos").collect()
    )
    assert [r["count"] for r in per_site] == [1, 2, 1, 1]


def test_roundtrip_normalization_coordinates(spark, roundtrip_vcf):
    rows = {
        (r.chrom, r.pos, r.alt): r
        for r in read_vcf(spark, roundtrip_vcf, normalize=True).collect()
    }
    r = rows[("chr2", 300, "A")]
    assert (r.ref, r.original_ref, r.original_alt) == ("AT", "ATT", "AT")
    # insertion normalizes trivially (right-trim bounded)
    ins = [v for (c, p, a), v in rows.items() if c == "chrX"]
    assert len(ins) == 1


def test_imputation_source_wiring(spark, tmp_path):
    """read_vcf(imputation_source=...) routes through the per-source
    extractor (minimac4 vs generic fallback)."""
    p = tmp_path / "imp.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "##source=Minimac4\n"
        '##INFO=<ID=R2,Number=1,Type=Float,Description="r2">\n'
        '##INFO=<ID=IMPUTED,Number=0,Type=Flag,Description="i">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\tR2=0.85;IMPUTED\n"
    )
    row = read_vcf(spark, str(p), imputation_source="auto").collect()[0]
    assert row.info_score == pytest.approx(0.85)
    assert row.is_imputed is True and row.is_typed is False


def test_beagle_is_typed_false_when_dr2_missing(spark, tmp_path):
    """Missing DR2 must yield is_typed=False (reference default), not
    NULL — a NULL would be dropped by both `is_typed` and `NOT is_typed`
    filters."""
    p = tmp_path / "beagle.vcf"
    p.write_text(
        "##fileformat=VCFv4.2\n"
        "##source=beagle5\n"
        '##INFO=<ID=DR2,Number=1,Type=Float,Description="r2">\n'
        '##INFO=<ID=IMP,Number=0,Type=Flag,Description="i">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\tDR2=1.0\n"
        "chr1\t200\t.\tC\tT\t50\tPASS\tDP=3\n"
    )
    rows = {r.pos: r for r in read_vcf(spark, str(p), imputation_source="auto").collect()}
    assert rows[100].is_typed is True
    assert rows[200].is_typed is False  # not None
