"""VCF scan semantics — decomposition, Number=A/R/G, normalization,
CSQ/ANN worst-consequence, missing-value handling (SURVEY §1.4).

Mirrors the reference's unit suites (tests/test_number_arg_extraction.py,
tests/unit/test_header_parsing.py, tests/unit/test_malformed_vcf.py)."""

from __future__ import annotations

import pytest

from tests.vcf_fixtures import write_vcf
from vcf_pg_loader_spark.sources.vcf import read_genotypes, read_header, read_vcf


@pytest.fixture(scope="module")
def multiallelic_vcf(tmp_path_factory):
    p = tmp_path_factory.mktemp("vcf") / "multi.vcf"
    rows = [
        "chr1\t100\trs1\tA\tG\t50.0\tPASS\tDP=30;AF=0.5;AC=1;DB\tGT:GQ:DP:AD\t0/1:99:30:15,15\t0/0:80:25:25,0",
        "1\t200\t.\tT\tC,G\t.\tLowQual\tDP=20;AF=0.3,0.1;AC=3,1;AD=10,6,4;PL=10,0,20,30,40,50\tGT:GQ\t1/2:50\t0/1:60",
        "chr1\t300\trs3\tATT\tAT\t99.0\tPASS\tDP=15;AF=0.2;AC=2\tGT\t0/1\t1/1",
        "chr1\t400\trs4\tG\tT\t70.0\tPASS\tDP=9;CSQ=T|missense_variant|MODERATE|GENE2|c.2A>T|p.K1X,T|stop_gained|HIGH|GENE2|c.3G>A|,A|synonymous_variant|LOW|GENE9||\tGT\t0/1\t0/0",
        "chr1\t500\trs5\tC\tA\t60.0\tPASS\tDP=12;ANN=A|missense_variant|MODERATE|GENEB|g1|transcript|tx9|Coding|1/2|c.1C>A|p.P1T|||||\tGT\t0/1\t0/0",
        "chr1\t600\trs6\tA\tT\t10.0\tq10;s50\tDP=5;INFO=0.4\tGT\t./.\t0/1",
    ]
    return str(write_vcf(str(p), rows, samples=["proband", "father"]))


def test_header(multiallelic_vcf):
    hdr = read_header(multiallelic_vcf)
    assert hdr.samples == ["proband", "father"]
    assert hdr.info_fields["AF"]["Number"] == "A"
    assert hdr.info_fields["AD"]["Number"] == "R"
    assert hdr.info_fields["PL"]["Number"] == "G"
    assert hdr.csq_fields == [
        "Allele", "Consequence", "IMPACT", "SYMBOL", "HGVSc", "HGVSp",
    ]
    assert hdr.ann_fields[0] == "Allele"
    assert hdr.contigs["chr1"]["length"] == "248956422"


def test_decomposition_and_arg_extraction(spark, multiallelic_vcf):
    df = read_vcf(spark, multiallelic_vcf)
    rows = {(r.pos, r.alt): r for r in df.collect()}
    # one row per ALT
    assert (200, "C") in rows and (200, "G") in rows
    c, g = rows[(200, "C")], rows[(200, "G")]
    # Number=A: value[alt_idx]
    assert (c.info["AF"], g.info["AF"]) == ("0.3", "0.1")
    assert (c.info["AC"], g.info["AC"]) == ("3", "1")
    # Number=R: [ref_val, alt_val]
    assert (c.info["AD"], g.info["AD"]) == ("10,6", "10,4")
    # Number=G diploid indices [0, i+1, (i+1)(i+2)/2 + i+1]
    assert (c.info["PL"], g.info["PL"]) == ("10,0,20", "10,20,50")
    # chromosome canonicalization
    assert c.chrom == "chr1"


def test_missing_value_handling(spark, multiallelic_vcf):
    rows = {(r.pos, r.alt): r for r in read_vcf(spark, multiallelic_vcf).collect()}
    r1 = rows[(100, "G")]
    assert r1.qual == pytest.approx(50.0)
    assert r1.filter == []  # PASS -> empty (vcf_parser.py:334-336)
    assert r1.rs_id == "rs1"
    assert "DB" in r1.info  # Flag present
    r2 = rows[(200, "C")]
    assert r2.qual is None  # '.' -> null
    assert r2.filter == ["LowQual"]
    assert r2.rs_id is None
    r6 = rows[(600, "T")]
    assert r6.filter == ["q10", "s50"]


def test_normalization_tracking(spark, multiallelic_vcf):
    rows = {(r.pos, r.alt): r for r in read_vcf(
        spark, multiallelic_vcf, normalize=True
    ).collect()}
    r = rows[(300, "A")]
    assert (r.ref, r.alt) == ("AT", "A")
    assert r.normalized is True
    assert (r.original_pos, r.original_ref, r.original_alt) == (300, "ATT", "AT")
    # untouched variant keeps nulls
    snp = rows[(100, "G")]
    assert snp.normalized is False and snp.original_pos is None


def test_csq_worst_consequence(spark, multiallelic_vcf):
    rows = {(r.pos, r.alt): r for r in read_vcf(spark, multiallelic_vcf).collect()}
    r = rows[(400, "T")]
    # two CSQ entries match ALT 'T'; HIGH outranks MODERATE
    assert r.gene == "GENE2"
    assert r.impact == "HIGH"
    assert r.consequence == "stop_gained"
    assert r.hgvs_c == "c.3G>A"
    assert r.hgvs_p is None  # empty field -> null


def test_ann_fallback(spark, multiallelic_vcf):
    rows = {(r.pos, r.alt): r for r in read_vcf(spark, multiallelic_vcf).collect()}
    r = rows[(500, "A")]
    assert r.gene == "GENEB"
    assert r.impact == "MODERATE"
    assert r.consequence == "missense_variant"
    assert r.transcript == "tx9"
    assert r.hgvs_c == "c.1C>A"


def test_info_score_filter(spark, multiallelic_vcf):
    df = read_vcf(spark, multiallelic_vcf, min_info_score=0.6)
    pos = {r.pos for r in df.collect()}
    assert 600 not in pos  # INFO=0.4 < 0.6 dropped
    assert 100 in pos  # null info_score passes


def test_end_pos_default(spark, multiallelic_vcf):
    rows = {(r.pos, r.alt): r for r in read_vcf(spark, multiallelic_vcf).collect()}
    assert rows[(300, "AT")].end_pos == 300 + 3  # pos + len(ref)


def test_multi_file_scan(spark, tmp_path):
    """A directory of shard VCFs with the same header reads as one
    distributed scan — the multi-file 100 TB shape."""
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        write_vcf(
            str(d / f"part{i}.vcf"),
            [f"chr{i + 1}\t{100 + i}\trs{i}\tA\tG\t50.0\tPASS\tDP={10 + i}"],
        )
    from vcf_pg_loader_spark.sources.vcf import read_header as rh

    hdr = rh(str(d / "part0.vcf"))
    df = read_vcf(spark, str(d / "*.vcf"), header=hdr)
    rows = df.collect()
    assert len(rows) == 3
    assert {r.chrom for r in rows} == {"chr1", "chr2", "chr3"}


def test_genotype_long_format(spark, multiallelic_vcf):
    df = read_genotypes(spark, multiallelic_vcf)
    rows = {(r.pos, r.sample_id): r for r in df.collect()}
    assert rows[(100, "proband")].gt == "0/1"
    assert rows[(100, "proband")].gq == 99
    assert rows[(100, "proband")].ad == [15, 15]
    assert rows[(100, "father")].gt == "0/0"
    assert rows[(600, "proband")].gt == "./."
    assert rows[(300, "father")].gq is None  # FORMAT lacks GQ


class TestFeatureGating:
    """read_vcf(features=) — header-gated derived-column projection.

    The schema is identical for every setting; only whether the derived
    groups are COMPUTED changes (disabled groups project typed NULLs)."""

    def test_schema_stable_across_feature_settings(self, spark, multiallelic_vcf):
        full = read_vcf(spark, multiallelic_vcf, features="all")
        minimal = read_vcf(spark, multiallelic_vcf, features=())
        auto = read_vcf(spark, multiallelic_vcf)
        assert full.schema == minimal.schema == auto.schema

    def test_auto_enables_declared_groups(self, spark, multiallelic_vcf):
        # fixture header declares CSQ/ANN (annotation), INFO (imputation),
        # END (info_extras) — auto must populate all of them
        rows = {(r.pos, r.alt): r for r in read_vcf(spark, multiallelic_vcf).collect()}
        assert rows[(400, "T")].gene == "GENE2"          # annotation on
        assert rows[(600, "T")].info_score is not None   # imputation on
        assert rows[(600, "T")].clinvar_sig is None      # no CLNSIG declared

    def test_disabled_groups_project_nulls(self, spark, multiallelic_vcf):
        rows = {
            (r.pos, r.alt): r
            for r in read_vcf(spark, multiallelic_vcf, features=()).collect()
        }
        r = rows[(400, "T")]
        assert r.gene is None and r.impact is None and r.consequence is None
        assert rows[(600, "T")].info_score is None
        # non-derived columns are untouched by the gating
        assert r.chrom == "chr1" and r.variant_type == "snp"
        # Number=A/R/G rewriting is correctness, not a feature group
        assert rows[(200, "C")].info["AF"] == "0.3"

    def test_min_info_score_forces_imputation_group(self, spark, multiallelic_vcf):
        df = read_vcf(
            spark, multiallelic_vcf, features=(), min_info_score=0.6
        )
        pos = {r.pos for r in df.collect()}
        assert 600 not in pos  # info_score 0.4 filtered despite features=()
        assert 100 in pos      # null info_score passes

    def test_unknown_feature_group_rejected(self, spark, multiallelic_vcf):
        with pytest.raises(ValueError, match="unknown read_vcf feature"):
            read_vcf(spark, multiallelic_vcf, features=("bogus",))


class TestGiabShapedBench:
    """The GIAB-shaped generator (parse_bench.write_synthetic_vcf_giab)
    must actually carry the GIAB v4.2.1 chr21 distribution it claims —
    83/16/1 SNP/indel/multiallelic and het/hom genotype mix — and parse
    cleanly through the same read_vcf path the bench times."""

    def test_distribution_and_parse(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.parse_bench import write_synthetic_vcf_giab
        from vcf_pg_loader_spark.sources.vcf import read_vcf

        n = 5_000
        glob = write_synthetic_vcf_giab(str(tmp_path), n, shards=4)
        df = read_vcf(spark, glob, normalize=True)
        rows = df.count()
        assert rows == n + n // 100  # each 1% multiallelic decomposes to 2

        mix = {
            r.variant_type: r.c
            for r in df.groupBy("variant_type").agg(
                F.count(F.lit(1)).alias("c")
            ).collect()
        }
        snp_pct = 100.0 * mix.get("snp", 0) / rows
        indel_pct = 100.0 * mix.get("indel", 0) / rows
        # GIAB chr21 expectation bands (reference tests/benchmark/README.md)
        assert 80.0 <= snp_pct <= 90.0
        assert 10.0 <= indel_pct <= 20.0

        # long INFO strings survived tokenization
        r0 = df.filter(F.col("pos") == 10_000).first()
        assert r0.info["platformnames"] and r0.info["difficultregion"]

    def test_genotype_mix(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.parse_bench import write_synthetic_vcf_giab
        from vcf_pg_loader_spark.sources.vcf import read_genotypes

        glob = write_synthetic_vcf_giab(str(tmp_path), 2_000, shards=2)
        import glob as _g

        path = sorted(_g.glob(glob))[0]
        gt = read_genotypes(spark, path)
        counts = {
            r.gt: r.c
            for r in gt.groupBy("gt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        het = counts.get("0/1", 0)
        hom = counts.get("1/1", 0)
        assert het + hom == sum(counts.values())  # never hom-ref
        assert 0.50 <= het / (het + hom) <= 0.64  # ~57% het
