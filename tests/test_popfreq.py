"""Population frequency extraction + popmax (annotations/population_freq.py)."""

from __future__ import annotations

import pytest

from vcf_pg_loader_spark.functions.phi import anonymize_sample_ids
from vcf_pg_loader_spark.operators.popfreq import gnomad_frequencies_long, popmax


@pytest.fixture(scope="module")
def variants_info(spark):
    rows = [
        (
            "chr1", 100, "A", "G",
            {"AF_afr": "0.05", "AF_nfe": "0.01", "AF_fin": "0.5",
             "AC_afr": "10", "AN_afr": "200"},
        ),
        ("chr1", 200, "T", "C", {"AF_asj": "0.9"}),  # only bottlenecked
        ("chr1", 300, "G", "A", {}),
    ]
    return spark.createDataFrame(
        rows, "chrom string, pos long, ref string, alt string, info map<string,string>"
    )


def test_long_extraction(spark, variants_info):
    long = gnomad_frequencies_long(variants_info)
    rows = {(r.pos, r.population): r for r in long.collect()}
    assert rows[(100, "AFR")].af == pytest.approx(0.05)
    assert rows[(100, "AFR")].ac == 10 and rows[(100, "AFR")].an == 200
    assert rows[(100, "NFE")].af == pytest.approx(0.01)
    assert (300, "AFR") not in rows  # empty info -> no rows


def test_popmax_excludes_bottlenecked(spark, variants_info):
    long = gnomad_frequencies_long(variants_info)
    pm = {r.pos: r for r in popmax(long).collect()}
    # FIN 0.5 excluded -> AFR 0.05 wins
    assert pm[100].popmax_af == pytest.approx(0.05)
    assert pm[100].popmax_population == "AFR"
    # variant with only ASJ has no popmax row
    assert 200 not in pm

    pm_all = {r.pos: r for r in popmax(long, exclude_bottlenecked=False).collect()}
    assert pm_all[100].popmax_af == pytest.approx(0.5)
    assert pm_all[200].popmax_population == "ASJ"


def test_anonymize_samples():
    m1 = anonymize_sample_ids(["proband", "father"], "/data/f.vcf")
    m2 = anonymize_sample_ids(["proband"], "/data/f.vcf")
    assert m1["proband"] == m2["proband"]  # stable per (sample, file)
    assert m1["proband"] != m1["father"]
    other = anonymize_sample_ids(["proband"], "/data/other.vcf")
    assert other["proband"] != m1["proband"]  # file-scoped
    # shape: UUID-ish
    assert len(m1["proband"]) == 36
