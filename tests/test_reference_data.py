"""Reference-data sources + matching joins (GWAS-SSF, PGS, HapMap3, LD
blocks) — the reference's driver-memory hash joins as Spark joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.matching import (
    assign_ld_blocks,
    flag_hapmap3,
    match_gwas_to_variants,
)
from vcf_pg_loader_spark.sources.tsv import (
    read_gwas_ssf,
    read_hapmap3,
    read_ld_blocks,
    read_pgs_catalog,
    read_pgs_header,
)


@pytest.fixture(scope="module")
def gwas_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("ref") / "gwas.tsv"
    p.write_text(
        "CHR\tPOS\tEA\tOA\tP\tSNP\tBETA\tSE\tEAF\n"
        "1\t100\tG\tA\t1e-8\trs1\t0.05\t0.01\t0.3\n"      # exact (alt=G ref=A)
        "1\t200\tT\tC\t0.5\trs2\t-0.02\t0.005\t0.1\n"     # swap orientation
        "2\t300\tC\tT\t0.01\trs3\t0.10\t0.02\t0.25\n"     # strand flip of G/A
        "9\t999\tA\tC\t0.9\trs_missing\t0.01\t0.01\t0.5\n"  # no match, rsid miss
        "3\t400\tA\tC\t0.2\trs4\t0.03\t0.01\t0.4\n"       # rsid fallback (pos off)
    )
    return str(p)


@pytest.fixture(scope="module")
def variants_frame(spark):
    rows = [
        (1, "chr1", 100, "A", "G", "rs1"),
        (2, "chr1", 200, "T", "C", "rs2"),
        (3, "chr2", 300, "G", "A", "rs3"),
        (4, "chr3", 401, "A", "C", "rs4"),  # pos differs -> only rsid matches
    ]
    return spark.createDataFrame(
        rows, ["variant_id", "chrom", "pos", "ref", "alt", "rs_id"]
    )


def test_gwas_reader_aliases(spark, gwas_file):
    df = read_gwas_ssf(spark, gwas_file)
    assert {"chromosome", "position", "effect_allele", "other_allele", "p_value",
            "rsid", "beta", "standard_error"} <= set(df.columns)
    assert df.count() == 5


def test_gwas_reader_missing_required(spark, tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("CHR\tPOS\tP\n1\t2\t0.5\n")
    with pytest.raises(ValueError, match="Missing required"):
        read_gwas_ssf(spark, str(p))


def test_gwas_matching_orientations(spark, gwas_file, variants_frame):
    stats = read_gwas_ssf(spark, gwas_file)
    out = {r.rsid: r for r in match_gwas_to_variants(stats, variants_frame).collect()}
    assert out["rs1"].variant_id == 1 and out["rs1"].match_source == "position"
    assert out["rs1"].is_effect_allele_alt is True
    assert out["rs1"].is_strand_flipped is False
    assert out["rs2"].variant_id == 2
    assert out["rs2"].is_effect_allele_alt is False  # EA matches REF
    assert out["rs3"].variant_id == 3  # strand-flipped match
    assert out["rs3"].is_strand_flipped is True
    assert out["rs4"].variant_id == 4 and out["rs4"].match_source == "rsid"
    assert out["rs_missing"].variant_id is None


def test_pgs_catalog_reader(spark, tmp_path):
    p = tmp_path / "PGS000001.txt"
    p.write_text(
        "#pgs_id=PGS000001\n#trait_reported=Height\n#genome_build=GRCh38\n"
        "rsID\tchr_name\tchr_position\teffect_allele\tother_allele\teffect_weight\n"
        "rs1\t1\t100\tA\tG\t0.5\n"
        "rs2\t2\t200\tc\tt\t-0.25\n"
    )
    meta = read_pgs_header(str(p))
    assert meta["pgs_id"] == "PGS000001"
    assert meta["genome_build"] == "GRCh38"
    rows = {r.rsid: r for r in read_pgs_catalog(spark, str(p)).collect()}
    assert rows["rs1"].effect_weight == 0.5
    assert rows["rs2"].effect_allele == "C"  # upper-cased


def test_hapmap3_flagging(spark, tmp_path):
    panel_file = tmp_path / "hm3.tsv"
    panel_file.write_text(
        "rsid\tchrom\tposition\ta1\ta2\n"
        "rs1\t1\t100\tA\tG\n"       # direct match
        "rs3\tchr2\t300\tC\tT\n"    # complement match of G/A
    )
    panel = read_hapmap3(spark, str(panel_file))
    variants = spark.createDataFrame(
        [
            ("chr1", 100, "A", "G"),
            ("chr2", 300, "G", "A"),
            ("chr5", 500, "A", "T"),
        ],
        ["chrom", "pos", "ref", "alt"],
    )
    out = {(r.chrom, r.pos): r for r in flag_hapmap3(variants, panel).collect()}
    assert out[("chr1", 100)].in_hapmap3 is True
    assert out[("chr1", 100)].hapmap3_rsid == "rs1"
    assert out[("chr2", 300)].in_hapmap3 is True  # strand complement
    assert out[("chr5", 500)].in_hapmap3 is False


def test_ld_block_assignment(spark, tmp_path):
    bed = tmp_path / "blocks.bed"
    bed.write_text(
        "chrom\tstart\tend\tn_snps_1kg\n"
        "chr1\t1\t1000\t50\n"
        "chr1\t1001\t2000\t30\n"
        "chr2\t1\t5000\t99\n"
    )
    blocks = read_ld_blocks(spark, str(bed), population="EUR")
    assert blocks.collect()[0].population == "EUR"
    variants = spark.createDataFrame(
        [("chr1", 500), ("chr1", 1500), ("chr2", 4999), ("chr3", 10)],
        ["chrom", "pos"],
    )
    out = assign_ld_blocks(variants, blocks).collect()
    by_pos = {(r.chrom, r.pos): r.ld_block_id for r in out}
    assert by_pos[("chr1", 500)] is not None
    assert by_pos[("chr1", 1500)] is not None
    assert by_pos[("chr1", 500)] != by_pos[("chr1", 1500)]
    assert by_pos[("chr3", 10)] is None


def test_ld_block_stats(spark, tmp_path):
    from vcf_pg_loader_spark.operators.matching import ld_block_stats

    bed = tmp_path / "blocks.bed"
    bed.write_text(
        "chrom\tstart\tend\tn_snps_1kg\n"
        "chr1\t1\t1000\t50\n"
        "chr1\t1001\t2000\t30\n"
        "chr2\t1\t5000\t100\n"
    )
    eur = read_ld_blocks(spark, str(bed), population="EUR")
    afr = read_ld_blocks(spark, str(bed), population="afr", build="grch38")
    stats = ld_block_stats(eur.unionByName(afr)).collect()
    assert [(r.population, r.genome_build) for r in stats] == [
        ("AFR", "GRCh38"),
        ("EUR", "GRCh37"),
    ]
    r = stats[1]
    assert (r.block_count, r.min_start, r.max_end) == (3, 1, 5000)
    assert r.avg_snps == pytest.approx(60.0)
    assert r.source == "Berisa_Pickrell_2016"
    only = ld_block_stats(eur.unionByName(afr), population="eur").collect()
    assert len(only) == 1 and only[0].population == "EUR"
