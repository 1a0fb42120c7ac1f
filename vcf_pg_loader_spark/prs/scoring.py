"""PRS scoring: dosage × weight aggregation + cohort standardization.

Reference semantics: docs/architecture.md:460-469, docs/prs-workflows.md
:174-181 (scoring), :291-296 (z-score), :326-337 (GT-CASE dosage
fallback).

Scale notes: the weights table (≤ a few M rows) broadcasts; genotypes
stream through one hash aggregation on sample_id.  The reference's
`AVG(...) OVER ()` global window would funnel the whole cohort through
one partition — replaced by a scalar aggregate cross-joined back
(SURVEY §7.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.genomics import gt_to_dosage


def score_samples(
    genotypes: DataFrame,
    weights: DataFrame,
    key: list[str] | None = None,
    dosage_col: str | None = "ds",
) -> DataFrame:
    """SUM(weight × dosage) per sample.

    genotypes: long frame with sample_id, (key cols), and `ds` (imputed
    dosage) and/or `gt`; missing dosage falls back to the GT CASE map.
    weights: frame with (key cols) + effect_weight.
    """
    key = key or ["chrom", "pos", "ref", "alt"]
    dosage = (
        F.coalesce(F.col(dosage_col).cast("double"), gt_to_dosage(F.col("gt")))
        if dosage_col and dosage_col in genotypes.columns
        else gt_to_dosage(F.col("gt"))
    )
    w = F.broadcast(weights.select(*key, "effect_weight"))
    return (
        genotypes.join(w, key)
        .select("sample_id", (dosage * F.col("effect_weight")).alias("contrib"))
        .groupBy("sample_id")
        .agg(
            F.sum("contrib").alias("prs_raw"),
            F.count(F.when(F.col("contrib").isNotNull(), 1)).alias("n_variants_used"),
        )
    )


def standardize(scores: DataFrame) -> DataFrame:
    """Cohort z-score without a global window: scalar mean/std broadcast
    back onto the frame (docs/prs-workflows.md:291-296)."""
    stats = scores.agg(
        F.avg("prs_raw").alias("_mean"), F.stddev_samp("prs_raw").alias("_std")
    )
    return (
        scores.crossJoin(F.broadcast(stats))
        .withColumn(
            "prs_z",
            F.when(
                F.col("_std").isNotNull() & (F.col("_std") != 0.0),
                (F.col("prs_raw") - F.col("_mean")) / F.col("_std"),
            ),
        )
        .drop("_mean", "_std")
    )
