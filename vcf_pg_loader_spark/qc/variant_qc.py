"""Variant-level QC: genotype counts, allele frequencies, HWE.

Reference semantics: qc/variant_qc.py.  Everything except HWE is pure
column expressions over the long genotype frame: one hash aggregation per
variant (partial + final, map-side combined), then scalar frequency math,
then the Arrow-batched HWE UDF on the (already tiny) per-variant frame —
the UDF runs on one row per variant, not one per genotype.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.hwe import hwe_exact_test

VARIANT_KEY = ["chrom", "pos", "ref", "alt"]


def classify_gt(gt: Column) -> Column:
    """Genotype class: 'het' / 'hom_ref' / 'hom_alt' / null for missing.

    Mirrors compute_genotype_counts (qc/variant_qc.py:15-75): missing if
    GT is '.', './.', '.|.' or either allele is non-numeric; haploid calls
    count as hom_ref/hom_alt.
    """
    g = F.translate(gt, "|", "/")
    parts = F.split(g, "/")
    a1 = F.element_at(parts, 1)
    a2 = F.when(F.size(parts) >= 2, F.element_at(parts, 2))
    # try_cast instead of a regex guard: non-integer alleles -> NULL with
    # no per-row regex evaluation (this is the hot path of every QC agg),
    # matching the reference's int() parse semantics (variant_qc.py:68-75)
    a1n = a1.try_cast("int")
    a2n = a2.try_cast("int")
    return (
        F.when(gt.isNull() | gt.isin(".", "./.", ".|."), F.lit(None))
        # haploid (no separator): single numeric allele
        .when(
            F.size(parts) == 1,
            F.when(a1n.isNull(), F.lit(None))
            .when(a1n == 0, "hom_ref")
            .otherwise("hom_alt"),
        )
        .when(F.size(parts) != 2, F.lit(None))
        .when(a1n.isNull() | a2n.isNull(), F.lit(None))
        .when(a1n == a2n, F.when(a1n == 0, "hom_ref").otherwise("hom_alt"))
        .otherwise("het")
    )


def genotype_counts(genotypes: DataFrame, key: list[str] | None = None) -> DataFrame:
    """Per-variant genotype counts from the long (variant, sample) frame."""
    key = key or VARIANT_KEY
    cls = classify_gt(F.col("gt"))
    return genotypes.groupBy(*key).agg(
        F.count(F.when(cls == "het", 1)).alias("n_het"),
        F.count(F.when(cls == "hom_ref", 1)).alias("n_hom_ref"),
        F.count(F.when(cls == "hom_alt", 1)).alias("n_hom_alt"),
        F.count(F.lit(1)).alias("n_samples"),
    ).withColumn("n_called", F.col("n_het") + F.col("n_hom_ref") + F.col("n_hom_alt"))


def with_allele_frequencies(counts: DataFrame) -> DataFrame:
    """AAF / MAF / MAC from genotype counts (qc/variant_qc.py:78-107)."""
    an = 2 * F.col("n_called")
    ac_alt = 2 * F.col("n_hom_alt") + F.col("n_het")
    ac_ref = 2 * F.col("n_hom_ref") + F.col("n_het")
    aaf = F.when(F.col("n_called") > 0, ac_alt.cast("double") / an.cast("double"))
    return (
        counts.withColumn("aaf", aaf)
        .withColumn("maf", F.least(F.col("aaf"), 1 - F.col("aaf")))
        .withColumn(
            "mac",
            F.when(F.col("n_called") > 0, F.least(ac_alt, ac_ref)).otherwise(0),
        )
        .withColumn(
            "call_rate",
            F.when(
                F.col("n_samples") > 0,
                F.col("n_called").cast("double") / F.col("n_samples"),
            ),
        )
    )


def with_hwe(counts: DataFrame) -> DataFrame:
    """Attach the Wigginton exact-test p-value (one UDF row per variant)."""
    return counts.withColumn(
        "hwe_p",
        hwe_exact_test(F.col("n_het"), F.col("n_hom_ref"), F.col("n_hom_alt")),
    )


def variant_qc(genotypes: DataFrame, key: list[str] | None = None) -> DataFrame:
    """Full variant QC pipeline: counts → frequencies → HWE."""
    return with_hwe(with_allele_frequencies(genotype_counts(genotypes, key)))
