"""Golden-file VCF parser test: a CHECKED-IN hand-built multiallelic VCF
(plain + BGZF) with pinned expected decomposition counts, per-ALT
Number=A/R/G extraction, and normalized coordinates.

The reference pins GIAB chr21 counts the same way (reference
tests/benchmark/README.md:17-33: 55,210 records -> 55,812 decomposed).
Unlike the synthetic-generator tests, nothing here is produced by code
that shares helpers with the parser under test — the fixture bytes are
static in tests/fixtures/, so parser drift cannot silently move the
expectations with it.

Fixture contents (36 data lines):
  - 20 bulk SNPs on chr1 (rs0..rs19)
  - multiallelics: A>C,T with AD/PL (Number=R/G), G>A,C,T, per-ALT-
    normalizing CAA>CA,C
  - symbolic ALTs: T><DEL> with END, C>G,<NON_REF>
  - unnormalized indels: right-trim (CTT>CT), both-trim (GAT>GCT),
    left-extension-needed (AC>C), prefix-trim (TA>TACG), lowercase
  - missing values: QUAL '.', FILTER '.', ID '.', multi-filter q10;s50
  - one malformed 3-column line (must be SKIPPED, not crash)
  - one empty ALT token (G,) and one pre-prefixed 'chr2' chrom
"""

from __future__ import annotations

import os

import pytest

from vcf_pg_loader_spark.sources.vcf import read_header, read_vcf

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PLAIN = os.path.join(FIXTURES, "golden_multiallelic.vcf")
BGZF = os.path.join(FIXTURES, "golden_multiallelic.vcf.gz")

# 36 data lines; 1 malformed skipped; ALT tokens: 20*1 + 2 + 3 + 1 + 2
# + 6*1 + 2 + 2*1 + (2 minus 1 empty) + 1 = 40 decomposed rows
N_DECOMPOSED = 40


def _rows(spark, path, **kw):
    return {
        (r.chrom, r.pos, r.alt): r for r in read_vcf(spark, path, **kw).collect()
    }


class TestGoldenHeader:
    def test_header_fields(self):
        hdr = read_header(PLAIN)
        assert hdr.fields_with_number("A") == ["AF"]
        assert hdr.fields_with_number("R") == ["AD"]
        assert hdr.fields_with_number("G") == ["PL"]
        assert set(hdr.contigs) == {"1", "2", "X"}
        assert hdr.samples == []  # sites-only file

    def test_bgzf_header_identical(self):
        assert read_header(BGZF).info_fields == read_header(PLAIN).info_fields


class TestGoldenDecomposition:
    def test_row_count_pinned(self, spark):
        assert read_vcf(spark, PLAIN).count() == N_DECOMPOSED

    def test_malformed_line_skipped_not_crashed(self, spark):
        # the 3-column line at pos 70001 must vanish silently
        assert (
            read_vcf(spark, PLAIN).filter("pos = 70001").count() == 0
        )

    def test_empty_alt_token_dropped(self, spark):
        rows = read_vcf(spark, PLAIN).filter("pos = 70101").collect()
        assert [(r.alt, r.alt_idx) for r in rows] == [("G", 0)]

    def test_chrom_canonicalization(self, spark):
        rows = _rows(spark, PLAIN)
        assert ("chr1", 10010, "G") in rows       # bare '1'
        assert ("chr2", 70201, "C") in rows       # already 'chr2'
        assert ("chrX", 60001, "GC") in rows      # bare 'X'

    def test_number_a_r_g_per_alt_extraction(self, spark):
        rows = _rows(spark, PLAIN)
        c = rows[("chr1", 20001, "C")]
        t = rows[("chr1", 20001, "T")]
        # Number=A: one value per ALT
        assert c.info["AF"] == "0.1" and t.info["AF"] == "0.2"
        # Number=R: ref value + this ALT's value
        assert c.info["AD"] == "50,30" and t.info["AD"] == "50,20"
        # Number=G diploid: ref/ref, ref/alt, alt/alt likelihoods.
        # NB the het index is REFERENCE parity (vcf_parser.py:449:
        # idx_0alt = alt_idx + 1), which for ALTs beyond the first
        # differs from the VCF-spec ordering F(j,k) = k(k+1)/2 + j
        # (spec would give 40, the 0/2 genotype, for ALT T); pinning
        # the reference's semantics is the contract here.
        assert c.info["PL"] == "10,20,30" and t.info["PL"] == "10,30,60"
        # flags survive as null-valued map keys
        assert "DB" in rows[("chr1", 10010, "G")].info

    def test_three_alt_decomposition(self, spark):
        rows = _rows(spark, PLAIN)
        alts = {
            (r.alt, r.alt_idx)
            for key, r in rows.items()
            if key[1] == 20101
        }
        assert alts == {("A", 0), ("C", 1), ("T", 2)}
        assert rows[("chr1", 20101, "A")].info["AF"] == "0.05"
        assert rows[("chr1", 20101, "T")].info["AF"] == "0.15"

    def test_symbolic_alts(self, spark):
        rows = _rows(spark, PLAIN)
        deletion = rows[("chr2", 30001, "<DEL>")]
        assert deletion.variant_type == "sv"
        assert deletion.end_pos == 30500  # END INFO wins over pos+len(ref)
        non_ref = rows[("chr2", 30101, "<NON_REF>")]
        assert non_ref.variant_type == "sv"
        assert rows[("chr2", 30101, "G")].variant_type == "snp"

    def test_missing_value_handling(self, spark):
        rows = _rows(spark, PLAIN)
        r = rows[("chrX", 60101, "T")]
        assert r.qual is None and r.filter == [] and r.rs_id is None
        assert rows[("chrX", 60001, "GC")].filter == ["q10", "s50"]
        assert rows[("chr1", 20101, "A")].rs_id is None
        assert rows[("chr1", 20001, "C")].rs_id == "rs_b1"
        assert rows[("chr1", 10010, "G")].end_pos == 10011  # pos + len(ref)

    def test_variant_type_census(self, spark):
        counts = {
            r.variant_type: r.n
            for r in read_vcf(spark, PLAIN)
            .groupBy("variant_type")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        assert counts == {"snp": 29, "sv": 2, "indel": 6, "mnp": 3}


class TestGoldenNormalization:
    """Pinned vt-normalized coordinates (hand-computed, not generated)."""

    @pytest.fixture(scope="class")
    def norm(self, spark):
        return {
            (r.original_pos or r.pos, r.alt_idx): r
            for r in read_vcf(spark, PLAIN, normalize=True).collect()
        }

    def test_count_unchanged_by_normalization(self, spark):
        assert read_vcf(spark, PLAIN, normalize=True).count() == N_DECOMPOSED

    def test_right_trim(self, norm):
        r = norm[(40001, 0)]
        assert (r.pos, r.ref, r.alt) == (40001, "CT", "C")
        assert r.normalized and not r.needs_left_extension
        assert (r.original_pos, r.original_ref, r.original_alt) == (
            40001, "CTT", "CT",
        )

    def test_trim_both_sides_to_snp(self, norm):
        r = norm[(40101, 0)]
        assert (r.pos, r.ref, r.alt) == (40102, "A", "C")
        assert r.variant_type == "snp" and r.normalized

    def test_left_extension_flagged(self, norm):
        # AC>C right-trims to A>'' and needs a genome base to finish
        r = norm[(40201, 0)]
        assert (r.pos, r.ref, r.alt) == (40201, "A", "")
        assert r.needs_left_extension and r.normalized

    def test_left_trim_insertion(self, norm):
        r = norm[(40301, 0)]
        assert (r.pos, r.ref, r.alt) == (40302, "A", "ACG")

    def test_already_normalized_untouched(self, norm):
        r = norm[(40401, 0)]
        assert (r.pos, r.ref, r.alt) == (40401, "T", "TGG")
        assert not r.normalized and r.original_pos is None

    def test_lowercase_uppercased_and_trimmed(self, norm):
        r = norm[(40501, 0)]
        assert (r.pos, r.ref, r.alt) == (40502, "C", "T")
        assert r.variant_type == "snp"

    def test_multiallelic_per_alt_normalization(self, norm):
        # CAA>CA right-trims; CAA>C is already minimal
        a0 = norm[(50001, 0)]
        assert (a0.pos, a0.ref, a0.alt, a0.normalized) == (50001, "CA", "C", True)
        a1 = norm[(50001, 1)]
        assert (a1.pos, a1.ref, a1.alt, a1.normalized) == (50001, "CAA", "C", False)
        assert a0.info["AF"] == "0.2" and a1.info["AF"] == "0.1"

    def test_normalization_census(self, spark):
        df = read_vcf(spark, PLAIN, normalize=True)
        assert df.filter("normalized").count() == 6
        assert df.filter("needs_left_extension").count() == 1


class TestGoldenBgzf:
    """The same pinned facts through the splittable BGZF range reader."""

    def test_bgzf_row_count_pinned(self, spark):
        assert read_vcf(spark, BGZF).count() == N_DECOMPOSED

    def test_bgzf_matches_plain_exactly(self, spark):
        plain = sorted(
            tuple(r) for r in read_vcf(spark, PLAIN, normalize=True).collect()
        )
        gz = sorted(
            tuple(r) for r in read_vcf(spark, BGZF, normalize=True).collect()
        )
        assert plain == gz

    def test_bgzf_normalized_coordinates(self, spark):
        rows = _rows(spark, BGZF, normalize=True)
        assert ("chr1", 40102, "C") in rows
        assert rows[("chr1", 40102, "C")].ref == "A"


# ---------------------------------------------------------------------------
# Golden fixture #2: annotated VCF pinning worst-consequence CSQ/ANN
# selection (reference vcf_parser.py:460-508) the way the multiallelic
# fixture pins decomposition — static bytes, exact per-ALT picks.
# ---------------------------------------------------------------------------
ANNOT = os.path.join(FIXTURES, "golden_annotated.vcf")
ANNOT_BGZF = os.path.join(FIXTURES, "golden_annotated.vcf.gz")

# (pos, alt) -> (gene, transcript, consequence, impact, hgvs_c, hgvs_p)
# Each row pins one selection behavior, see the fixture's INFO payloads:
#   100/C  per-ALT match in a multiallelic (worst of C's two entries)
#   100/T  the sibling ALT picks ITS worst entry (HIGH beats MODIFIER)
#   200/A  equal-impact tie -> FIRST entry in CSQ order wins
#   300/G  HIGH listed AFTER MODIFIER still wins (order-independent)
#   400/G  malformed entry (wrong field count) is dropped, not picked
#   500/G  ANN-only: worst-impact across transcripts + Feature_ID kept
#   600/T  CSQ allele matches nothing -> ANN fallback supplies all
#   700/A  ANN empty-allele entry matches any ALT; MODERATE beats it
#   800/T  unknown impact string ranks LAST (LOW entry wins)
#   1000/C no CSQ/ANN at all -> INFO scalar SYMBOL/Consequence/IMPACT
PINNED_PICKS = {
    (100, "C"): ("GENEA", None, "missense_variant", "MODERATE", "c.1A>C", "p.T1P"),
    (100, "T"): ("GENEB", None, "stop_gained", "HIGH", "c.3C>T", "p.R3*"),
    (200, "A"): ("GENEC", None, "missense_variant", "MODERATE", "c.10G>A", "p.V4M"),
    (300, "G"): ("GENED", None, "splice_donor_variant", "HIGH", "c.20+1C>G", None),
    (400, "G"): ("GENEE", None, "5_prime_UTR_variant", "LOW", None, None),
    (500, "G"): ("GENEF", "ENST0006.2", "stop_gained", "HIGH", "c.31", "p.Q11*"),
    (600, "T"): ("GENEH", "ENST0008", "downstream_gene_variant", "MODIFIER", "c.35", None),
    (700, "A"): ("GENEI", "ENST0009.2", "missense_variant", "MODERATE", None, None),
    (800, "T"): ("GENEJ", None, "3_prime_UTR_variant", "LOW", None, None),
    (1000, "C"): ("GENEL", None, "regulatory_region_variant", "MODIFIER", None, None),
}


def _annotation_picks(spark, path):
    return {
        (r.pos, r.alt): (
            r.gene, r.transcript, r.consequence, r.impact, r.hgvs_c, r.hgvs_p
        )
        for r in read_vcf(spark, path, normalize=True).collect()
        if r.pos != 900
    }


class TestGoldenAnnotation:
    def test_header_declares_both_formats(self):
        hdr = read_header(ANNOT)
        assert hdr.csq_fields == [
            "Allele", "Consequence", "IMPACT", "SYMBOL", "Gene", "HGVSc", "HGVSp"
        ]
        assert hdr.ann_fields[:3] == ["Allele", "Annotation", "Annotation_Impact"]

    def test_worst_consequence_picks_pinned(self, spark):
        assert _annotation_picks(spark, ANNOT) == PINNED_PICKS

    def test_normalized_alt_keeps_original_allele_match(self, spark):
        """The reference matches annotation alleles against the ORIGINAL
        alt (vcf_parser.py:347), so normalization must not detach the
        CSQ entry: CAA>CA normalizes to CA>C yet still carries the
        CA-allele annotation; the literal-C ALT carries the C one."""
        rows = {
            (r.ref, r.alt): r
            for r in read_vcf(spark, ANNOT, normalize=True)
            .filter("pos = 900")
            .collect()
        }
        norm = rows[("CA", "C")]
        assert norm.normalized and norm.original_alt == "CA"
        assert (norm.gene, norm.consequence, norm.impact, norm.hgvs_c) == (
            "GENEK", "inframe_deletion", "MODERATE", "c.40del"
        )
        plain = rows[("CAA", "C")]
        assert not plain.normalized
        assert (plain.consequence, plain.impact, plain.hgvs_c) == (
            "frameshift_variant", "HIGH", "c.41del"
        )

    def test_bgzf_reader_identical_picks(self, spark):
        assert _annotation_picks(spark, ANNOT_BGZF) == PINNED_PICKS
        plain = sorted(
            tuple(r) for r in read_vcf(spark, ANNOT, normalize=True).collect()
        )
        gz = sorted(
            tuple(r)
            for r in read_vcf(spark, ANNOT_BGZF, normalize=True).collect()
        )
        assert plain == gz
