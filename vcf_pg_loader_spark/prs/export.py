"""PRS-tool TSV exporters: PLINK --score, PRS-CS, LDpred2, PRSice-2.

Reference semantics: export/prs_formats.py:91-321 — each format is a
projection + filters + `ORDER BY chrom, pos` over gwas_stats ⋈ variants.

Chromosome ordering uses the enum sort key (chr1..22,X,Y,M —
schema.py:15-41); distributed sort + single-file coalesce keeps the
output byte-stable for downstream tools that require ordered input."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.genomics import chrom_sort_key


@dataclass
class VariantFilter:
    """Export filters (export/prs_formats.py:20-56)."""

    hapmap3_only: bool = False
    min_info_score: float | None = None
    min_maf: float | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        if self.hapmap3_only:
            df = df.filter(F.col("in_hapmap3") == True)  # noqa: E712
        if self.min_info_score is not None:
            df = df.filter(F.col("info_score") >= self.min_info_score)
        if self.min_maf is not None:
            df = df.filter(F.col("maf") >= self.min_maf)
        return df


def _joined(stats: DataFrame, variants: DataFrame, vfilter: VariantFilter | None):
    v = variants if vfilter is None else vfilter.apply(variants)
    return stats.join(v, "variant_id").filter(
        F.col("rs_id").isNotNull() & F.col("beta").isNotNull()
    )


def _ordered(df: DataFrame) -> DataFrame:
    return df.orderBy(chrom_sort_key(F.col("chrom")), F.col("pos"))


def plink_score_frame(
    stats: DataFrame, variants: DataFrame, vfilter: VariantFilter | None = None
) -> DataFrame:
    """PLINK 2.0 --score: SNP A1 BETA (export/prs_formats.py:91-137)."""
    return _ordered(_joined(stats, variants, vfilter)).select(
        F.col("rs_id").alias("SNP"),
        F.col("effect_allele").alias("A1"),
        F.col("beta").alias("BETA"),
    )


def prs_cs_frame(
    stats: DataFrame,
    variants: DataFrame,
    use_se: bool = True,
    vfilter: VariantFilter | None = None,
) -> DataFrame:
    """PRS-CS: SNP A1 A2 BETA SE|P (export/prs_formats.py:140-200)."""
    last: Column = (
        F.col("standard_error").alias("SE") if use_se else F.col("p_value").alias("P")
    )
    return _ordered(
        _joined(stats, variants, vfilter).filter(F.col("other_allele").isNotNull())
    ).select(
        F.col("rs_id").alias("SNP"),
        F.col("effect_allele").alias("A1"),
        F.col("other_allele").alias("A2"),
        F.col("beta").alias("BETA"),
        last,
    )


def ldpred2_frame(
    stats: DataFrame, variants: DataFrame, vfilter: VariantFilter | None = None
) -> DataFrame:
    """LDpred2/bigsnpr: chr pos rsid a1 a0 beta beta_se n_eff
    (export/prs_formats.py:203-260)."""
    from vcf_pg_loader_spark.functions.genomics import n_eff as n_eff_expr

    df = _joined(stats, variants, vfilter).filter(
        F.col("other_allele").isNotNull() & F.col("standard_error").isNotNull()
    )
    n_eff = F.when(
        F.col("n_cases").isNotNull() & F.col("n_controls").isNotNull(),
        n_eff_expr(F.col("n_cases"), F.col("n_controls")),
    ).otherwise(F.col("n").cast("double"))
    return _ordered(df).select(
        F.regexp_replace(F.col("chrom"), "^chr", "").alias("chr"),
        F.col("pos"),
        F.col("rs_id").alias("rsid"),
        F.col("effect_allele").alias("a1"),
        F.col("other_allele").alias("a0"),
        F.col("beta"),
        F.col("standard_error").alias("beta_se"),
        n_eff.alias("n_eff"),
    )


def prsice2_frame(
    stats: DataFrame, variants: DataFrame, vfilter: VariantFilter | None = None
) -> DataFrame:
    """PRSice-2: SNP CHR BP A1 A2 BETA SE P (export/prs_formats.py:263-321)."""
    return _ordered(
        _joined(stats, variants, vfilter).filter(F.col("other_allele").isNotNull())
    ).select(
        F.col("rs_id").alias("SNP"),
        F.regexp_replace(F.col("chrom"), "^chr", "").alias("CHR"),
        F.col("pos").alias("BP"),
        F.col("effect_allele").alias("A1"),
        F.col("other_allele").alias("A2"),
        F.col("beta").alias("BETA"),
        F.col("standard_error").alias("SE"),
        F.col("p_value").alias("P"),
    )


def write_tsv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Tab-separated export; coalesce(1) for tool-ready single files —
    the coalesce only gates the final write, the sort stays distributed."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").options(sep="\t", header=True).csv(path)
