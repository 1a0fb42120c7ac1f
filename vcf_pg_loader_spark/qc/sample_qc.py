"""Sample-level QC rollup as one grouped aggregation.

Reference semantics: qc/sample_qc.py — call rate, het/hom ratio, Ti/Tv,
X-heterozygosity sex inference, inbreeding F, singleton count, QC-pass
evaluation (Pe'er-pipeline thresholds).

The reference issues 5 separate SQL queries per sample (N+1 pattern,
sample_qc.py:378-519); here every metric folds into a single
`groupBy('sample_id')` over the joined genotype+variant frame — one
shuffle for the whole cohort regardless of sample count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.genomics import is_transition
from vcf_pg_loader_spark.qc.variant_qc import classify_gt


@dataclass(frozen=True)
class SampleQCConfig:
    """Pe'er-pipeline defaults (reference sample_qc.py:26-40)."""

    male_x_het_threshold: float = 0.05
    female_x_het_threshold: float = 0.15
    min_call_rate: float = 0.99
    max_contamination: float = 0.025
    x_par_start: int = 2781479
    x_par_end: int = 155701383


DEFAULT_QC_CONFIG = SampleQCConfig()


def sample_qc(
    genotypes: DataFrame,
    variant_maf: DataFrame | None = None,
    config: SampleQCConfig = DEFAULT_QC_CONFIG,
) -> DataFrame:
    """Per-sample QC metrics in one aggregation pass.

    genotypes: long frame with (chrom, pos, ref, alt, sample_id, gt) —
      e.g. sources.vcf.read_genotypes output (first ALT orientation).
    variant_maf: optional per-variant frame with (chrom,pos,ref,alt,
      maf, mac) — joined in for expected-het / F and singleton counting.
    """
    g = genotypes.withColumn("_cls", classify_gt(F.col("gt")))
    for opt in ("dp", "gq"):  # depth/quality columns are optional
        if opt not in g.columns:
            g = g.withColumn(opt, F.lit(None).cast("int"))

    if variant_maf is not None:
        g = g.join(
            variant_maf.select("chrom", "pos", "ref", "alt", "maf", "mac"),
            ["chrom", "pos", "ref", "alt"],
            "left",
        )
    else:
        g = g.withColumn("maf", F.lit(None).cast("double")).withColumn(
            "mac", F.lit(None).cast("bigint")
        )

    is_called = F.col("_cls").isNotNull()
    is_het = F.col("_cls") == "het"
    is_hom_alt = F.col("_cls") == "hom_alt"
    carries_alt = is_het | is_hom_alt
    is_snp = (F.length("ref") == 1) & (F.length("alt") == 1)
    on_x_par = (
        F.col("chrom").isin("chrX", "X")
        & (F.col("pos") > config.x_par_start)
        & (F.col("pos") < config.x_par_end)
    )

    agg = g.groupBy("sample_id").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(is_called, 1)).alias("n_called"),
        F.count(F.when(is_called & is_snp, 1)).alias("n_snp"),
        F.count(F.when(is_het, 1)).alias("n_het"),
        F.count(F.when(is_hom_alt, 1)).alias("n_hom_var"),
        F.avg(F.col("dp").cast("double")).alias("mean_dp"),
        F.avg(F.col("gq").cast("double")).alias("mean_gq"),
        # Ti/Tv over carried SNPs (sample_qc.py:443-467)
        F.count(
            F.when(carries_alt & is_snp & is_transition(F.col("ref"), F.col("alt")), 1)
        ).alias("n_transitions"),
        F.count(
            F.when(
                carries_alt & is_snp & ~is_transition(F.col("ref"), F.col("alt")), 1
            )
        ).alias("n_transversions"),
        # X-het for sex inference (sample_qc.py:469-492)
        F.count(F.when(on_x_par & is_called, 1)).alias("x_n_total"),
        F.count(F.when(on_x_par & is_het, 1)).alias("x_n_het"),
        # expected het under HWE: sum over variants of 2·maf·(1-maf).
        # Per-row decimal cast (queries/_util.py pattern): double sums are
        # partial-aggregation-order dependent; decimal addition is exact,
        # so the result is reproducible across partitionings and engines.
        F.sum(
            F.when(
                is_called,
                (2 * F.col("maf") * (1 - F.col("maf"))).cast("decimal(28,12)"),
            )
        )
        .cast("double")
        .alias("expected_het"),
        # singletons: MAC==1 and this sample carries the allele
        F.count(F.when(carries_alt & (F.col("mac") == 1), 1)).alias("n_singleton"),
    )

    call_rate = F.when(
        F.col("n_total") > 0,
        F.col("n_called").cast("double") / F.col("n_total"),
    ).otherwise(0.0)
    x_het_rate = F.when(
        F.col("x_n_total") > 0,
        F.col("x_n_het").cast("double") / F.col("x_n_total"),
    ).otherwise(0.0)

    out = (
        agg.withColumn("call_rate", call_rate)
        .withColumn(
            "het_hom_ratio",
            F.when(
                F.col("n_hom_var") > 0,
                F.col("n_het").cast("double") / F.col("n_hom_var"),
            ),
        )
        .withColumn(
            "ti_tv_ratio",
            F.when(
                F.col("n_transversions") > 0,
                F.col("n_transitions").cast("double") / F.col("n_transversions"),
            ),
        )
        .withColumn("x_het_rate", x_het_rate)
        .withColumn(
            "sex_inferred",
            F.when(F.col("x_het_rate") <= config.male_x_het_threshold, "M")
            .when(F.col("x_het_rate") >= config.female_x_het_threshold, "F")
            .otherwise("unknown"),
        )
        .withColumn(
            "f_inbreeding",
            F.when(
                F.col("expected_het").isNotNull() & (F.col("expected_het") != 0),
                1.0 - F.col("n_het") / F.col("expected_het"),
            ),
        )
    )
    return out.withColumn("qc_pass", evaluate_qc_pass_expr(config=config))


def evaluate_qc_pass_expr(
    contamination=None,
    sex_concordant=None,
    config: SampleQCConfig = DEFAULT_QC_CONFIG,
):
    """QC pass column (sample_qc.py:172-210; generated column
    qc/schema.py:36-41): call_rate >= 0.99, contamination < 0.025 or
    NULL, sex concordant or NULL."""
    passes = F.col("call_rate") >= config.min_call_rate
    if contamination is not None:
        passes = passes & (
            contamination.isNull() | (contamination < config.max_contamination)
        )
    if sex_concordant is not None:
        passes = passes & (sex_concordant.isNull() | sex_concordant)
    return passes
