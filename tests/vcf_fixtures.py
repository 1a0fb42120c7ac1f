"""Minimal synthetic VCF writer for tests — the same role as the
reference's tests/fixtures/vcf_generator.py, written fresh."""

from __future__ import annotations

HEADER = """##fileformat=VCFv4.2
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##INFO=<ID=AF,Number=A,Type=Float,Description="Allele freq">
##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count">
##INFO=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">
##INFO=<ID=PL,Number=G,Type=Integer,Description="Likelihoods">
##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP membership">
##INFO=<ID=END,Number=1,Type=Integer,Description="End position">
##INFO=<ID=INFO,Number=1,Type=Float,Description="Imputation info score">
##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from Ensembl VEP. Format: Allele|Consequence|IMPACT|SYMBOL|HGVSc|HGVSp">
##INFO=<ID=ANN,Number=.,Type=String,Description="Functional annotations: 'Allele | Annotation | Annotation_Impact | Gene_Name | Gene_ID | Feature_Type | Feature_ID | Transcript_BioType | Rank | HGVS.c | HGVS.p | cDNA.pos/cDNA.length | CDS.pos/CDS.length | AA.pos/AA.length | Distance | ERRORS/WARNINGS/INFO'">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Depths">
##FORMAT=<ID=DS,Number=1,Type=Float,Description="Dosage">
##FORMAT=<ID=GP,Number=G,Type=Float,Description="Genotype probabilities">
##contig=<ID=chr1,length=248956422>
##contig=<ID=chrX,length=156040895>
"""


def write_vcf(path: str, rows: list[str], samples: list[str] | None = None) -> str:
    """rows: pre-formatted body lines (tab-separated).  Returns path."""
    cols = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
    if samples:
        cols += ["FORMAT", *samples]
    with open(path, "w") as fh:
        fh.write(HEADER)
        fh.write("\t".join(cols) + "\n")
        for r in rows:
            fh.write(r + "\n")
    return path
