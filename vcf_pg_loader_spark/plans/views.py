"""Materialized-view jobs (views/prs_views.py:26-131, qc/schema.py:74-100).

A Postgres matview becomes a precomputed DataFrame job: compute → write
Parquet → re-register.  "REFRESH CONCURRENTLY" becomes write-new-dir-
then-atomic-swap (refresh_view), so readers never see a partial view —
the same zero-downtime property, without locks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def prs_filter():
    """PRS candidate gates (views/prs_views.py:68-72).  Built lazily —
    Column construction needs a live session."""
    return (
        (F.col("in_hapmap3") == True)  # noqa: E712 — mirrors the SQL predicate
        & (F.col("info_score") >= 0.6)
        & (F.col("call_rate") >= 0.98)
        & (F.col("hwe_p") > 1e-6)
        & (F.col("maf") >= 0.01)
    )


def prs_candidate_variants(
    variants: DataFrame,
    population_frequencies: DataFrame | None = None,
    gwas_stats: DataFrame | None = None,
) -> DataFrame:
    """QC-passing, GWAS-matched candidates with per-population gnomAD AFs
    (views/prs_views.py:26-73).  The three per-population LEFT JOINs are a
    single join + pivot — one shuffle instead of three."""
    out = variants.filter(prs_filter())
    if population_frequencies is not None:
        pf = (
            population_frequencies.filter(
                (F.col("source") == "gnomAD_v3")
                & F.col("population").isin("NFE", "AFR", "EAS")
            )
            .groupBy("variant_id")
            .pivot("population", ["NFE", "AFR", "EAS"])
            .agg(F.first("af"))
            .select(
                "variant_id",
                F.col("NFE").alias("gnomad_nfe_af"),
                F.col("AFR").alias("gnomad_afr_af"),
                F.col("EAS").alias("gnomad_eas_af"),
            )
        )
        out = out.join(pf, "variant_id", "left")
    if gwas_stats is not None:
        out = out.join(
            gwas_stats.select("variant_id", "beta", "standard_error", "p_value"),
            "variant_id",
            "inner",
        )
    return out


def variant_qc_summary(variants: DataFrame) -> DataFrame:
    """Single-row conditional-count rollup (views/prs_views.py:89-107)."""
    return variants.agg(
        F.count(F.lit(1)).alias("total_variants"),
        F.count(F.when(F.col("in_hapmap3") == True, 1)).alias(  # noqa: E712
            "hapmap3_variants"
        ),
        F.count(F.when(F.col("info_score") >= 0.6, 1)).alias("high_info_variants"),
        F.count(F.when(F.col("call_rate") >= 0.98, 1)).alias(
            "high_callrate_variants"
        ),
        F.count(F.when(F.col("hwe_p") > 1e-6, 1)).alias("hwe_pass_variants"),
        F.count(F.when(F.col("maf") >= 0.01, 1)).alias("common_variants"),
        F.count(F.when(prs_filter(), 1)).alias("prs_ready_variants"),
    )


def chromosome_variant_counts(variants: DataFrame) -> DataFrame:
    """Per-chromosome counts (views/prs_views.py:117-126)."""
    return variants.groupBy("chrom").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.count(F.when(F.col("in_hapmap3") == True, 1)).alias("n_hapmap3"),  # noqa: E712
        F.count(
            F.when((F.col("in_hapmap3") == True) & (F.col("info_score") >= 0.6), 1)  # noqa: E712
        ).alias("n_prs_ready"),
    )


def sample_qc_summary(sample_qc: DataFrame) -> DataFrame:
    """Per-batch sample QC rollup incl. exact median (qc/schema.py:74-97)."""
    batch = (
        F.col("batch_id") if "batch_id" in sample_qc.columns else F.lit(None)
    ).alias("batch_id")
    return sample_qc.groupBy(batch).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count(F.when(F.col("qc_pass") == True, 1)).alias("n_pass"),  # noqa: E712
        F.avg("call_rate").alias("avg_call_rate"),
        F.min("call_rate").alias("min_call_rate"),
        F.max("call_rate").alias("max_call_rate"),
        F.expr("percentile(call_rate, 0.5)").alias("median_call_rate"),
        F.count(F.when(F.col("sex_inferred") == "unknown", 1)).alias(
            "n_sex_unknown"
        ),
    )


def refresh_view(df: DataFrame, path: str, view_name: str) -> str:
    """Write-new-then-swap 'concurrent refresh': write to a versioned dir,
    atomically repoint a symlink, re-register the temp view."""
    import tempfile
    import time

    spark = df.sparkSession
    base = path.rstrip("/")
    os.makedirs(base, exist_ok=True)
    version_dir = os.path.join(
        base, f"v{int(time.time() * 1000)}_{next(tempfile._get_candidate_names())}"
    )
    df.write.mode("overwrite").parquet(version_dir)
    link = os.path.join(base, "current")
    tmp_link = link + ".tmp"
    if os.path.islink(tmp_link) or os.path.exists(tmp_link):
        os.remove(tmp_link)
    os.symlink(version_dir, tmp_link)
    os.replace(tmp_link, link)
    spark.read.parquet(version_dir).createOrReplaceTempView(view_name)
    return version_dir
