"""PRS export frames + candidate view, oracle-checked end-to-end.

These queries route through the REAL export operators (prs/export.py —
reference export/prs_formats.py:91-321) and the REAL candidate view
(plans/views.py prs_candidate_variants — reference views/prs_views.py:
26-73) over deterministic synthetic gwas/variant frames derived from the
`part` fixture, so the DuckDB oracle validates the engine code itself
(same pattern as queries/genomics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcf_pg_loader_spark.prs.export import (
    VariantFilter,
    ldpred2_frame,
    plink_score_frame,
    prs_cs_frame,
    prsice2_frame,
)
from vcf_pg_loader_spark.queries.genomics import SQL_VARIANTS, synth_variants


# ---------------------------------------------------------------------------
# synthetic export inputs (Spark + SQL twins)
# ---------------------------------------------------------------------------
def export_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variant frame with the QC columns the export filters and the
    candidate view read; rs_id nullable to exercise the export gate."""
    v = synth_variants(spark, sf_dir)
    k = F.col("variant_id")
    return v.select(
        "variant_id",
        "chrom",
        "pos",
        F.when(k % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("rs"), k))
        .alias("rs_id"),
        (k % 2 == 0).alias("in_hapmap3"),
        ((k % 100) / 100.0).alias("info_score"),
        (0.90 + (k % 10) / 100.0).alias("call_rate"),
        (((k % 1000) + 1) / 1000.0).alias("hwe_p"),
        ((k % 50) / 100.0).alias("maf"),
    )


SQL_EXPORT_VARIANTS = f"""
  SELECT variant_id, chrom, pos,
         CASE WHEN variant_id % 13 = 0 THEN NULL
              ELSE 'rs' || CAST(variant_id AS VARCHAR) END AS rs_id,
         variant_id % 2 = 0 AS in_hapmap3,
         (variant_id % 100) / 100.0 AS info_score,
         0.90 + (variant_id % 10) / 100.0 AS call_rate,
         ((variant_id % 1000) + 1) / 1000.0 AS hwe_p,
         (variant_id % 50) / 100.0 AS maf
  FROM ({SQL_VARIANTS})
"""


def export_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GWAS summary stats keyed by variant_id; beta/SE/other_allele and
    case-control counts go NULL on deterministic cycles so every export
    filter and the n_eff fallback are exercised."""
    v = synth_variants(spark, sf_dir)
    k = F.col("variant_id")
    return v.select(
        "variant_id",
        F.col("alt").alias("effect_allele"),
        F.when(k % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("ref"))
        .alias("other_allele"),
        F.when(k % 23 == 0, F.lit(None).cast("double"))
        .otherwise((k % 19 - 9) / 10.0)
        .alias("beta"),
        F.when(k % 11 == 0, F.lit(None).cast("double"))
        .otherwise(0.01 + (k % 7) / 100.0)
        .alias("standard_error"),
        (((k % 997) + 1) / 1000.0).alias("p_value"),
        (10000 + k % 5000).alias("n"),
        F.when(k % 3 == 0, F.lit(None).cast("bigint"))
        .otherwise(1000 + k % 100)
        .alias("n_cases"),
        F.when(k % 3 == 0, F.lit(None).cast("bigint"))
        .otherwise(2000 + k % 200)
        .alias("n_controls"),
    )


SQL_EXPORT_STATS = f"""
  SELECT variant_id,
         alt AS effect_allele,
         CASE WHEN variant_id % 17 = 0 THEN NULL ELSE ref END AS other_allele,
         CASE WHEN variant_id % 23 = 0 THEN NULL
              ELSE (variant_id % 19 - 9) / 10.0 END AS beta,
         CASE WHEN variant_id % 11 = 0 THEN NULL
              ELSE 0.01 + (variant_id % 7) / 100.0 END AS standard_error,
         ((variant_id % 997) + 1) / 1000.0 AS p_value,
         10000 + variant_id % 5000 AS n,
         CASE WHEN variant_id % 3 = 0 THEN NULL
              ELSE 1000 + variant_id % 100 END AS n_cases,
         CASE WHEN variant_id % 3 = 0 THEN NULL
              ELSE 2000 + variant_id % 200 END AS n_controls
  FROM ({SQL_VARIANTS})
"""

_FILTER = VariantFilter(hapmap3_only=True, min_info_score=0.2, min_maf=0.05)

# SQL twin of _FILTER + the rs_id/beta export gate (prs/export.py:38-42)
_SQL_JOINED = f"""
  SELECT s.*, v.chrom, v.pos, v.rs_id
  FROM ({SQL_EXPORT_STATS}) s
  JOIN ({SQL_EXPORT_VARIANTS}) v USING (variant_id)
  WHERE v.in_hapmap3 AND v.info_score >= 0.2 AND v.maf >= 0.05
    AND v.rs_id IS NOT NULL AND s.beta IS NOT NULL
"""


# ---------------------------------------------------------------------------
# the four exporters (prs/export.py; reference export/prs_formats.py)
# ---------------------------------------------------------------------------
def q_export_plink(spark: SparkSession, sf_dir: str) -> DataFrame:
    return plink_score_frame(
        export_stats(spark, sf_dir), export_variants(spark, sf_dir), _FILTER
    )


Q_EXPORT_PLINK_SQL = f"""
SELECT rs_id AS "SNP", effect_allele AS "A1", beta AS "BETA"
FROM ({_SQL_JOINED})
"""


def q_export_prs_cs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prs_cs_frame(
        export_stats(spark, sf_dir),
        export_variants(spark, sf_dir),
        use_se=True,
        vfilter=_FILTER,
    )


Q_EXPORT_PRS_CS_SQL = f"""
SELECT rs_id AS "SNP", effect_allele AS "A1", other_allele AS "A2",
       beta AS "BETA", standard_error AS "SE"
FROM ({_SQL_JOINED}) WHERE other_allele IS NOT NULL
"""


def q_export_ldpred2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ldpred2_frame(
        export_stats(spark, sf_dir), export_variants(spark, sf_dir), _FILTER
    )


Q_EXPORT_LDPRED2_SQL = f"""
SELECT regexp_replace(chrom, '^chr', '') AS chr, pos, rs_id AS rsid,
       effect_allele AS a1, other_allele AS a0, beta,
       standard_error AS beta_se,
       CASE WHEN n_cases IS NOT NULL AND n_controls IS NOT NULL THEN
              CASE WHEN n_cases = 0 OR n_controls = 0 THEN NULL
                   ELSE 4.0 * n_cases * n_controls / (n_cases + n_controls) END
            ELSE CAST(n AS DOUBLE) END AS n_eff
FROM ({_SQL_JOINED})
WHERE other_allele IS NOT NULL AND standard_error IS NOT NULL
"""


def q_export_prsice2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prsice2_frame(
        export_stats(spark, sf_dir), export_variants(spark, sf_dir), _FILTER
    )


Q_EXPORT_PRSICE2_SQL = f"""
SELECT rs_id AS "SNP", regexp_replace(chrom, '^chr', '') AS "CHR",
       pos AS "BP", effect_allele AS "A1", other_allele AS "A2",
       beta AS "BETA", standard_error AS "SE", p_value AS "P"
FROM ({_SQL_JOINED}) WHERE other_allele IS NOT NULL
"""


# ---------------------------------------------------------------------------
# PRS candidate view (plans/views.py; reference views/prs_views.py:26-73)
# ---------------------------------------------------------------------------
def export_popfreqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-population AF rows: gnomAD_v3 NFE/AFR/EAS plus an off-source
    row that the view's source filter must drop."""
    v = synth_variants(spark, sf_dir).select("variant_id")
    pops = spark.createDataFrame(
        [("NFE", "gnomAD_v3", 1), ("AFR", "gnomAD_v3", 2),
         ("EAS", "gnomAD_v3", 3), ("NFE", "other_source", 4)],
        ["population", "source", "salt"],
    )
    return v.crossJoin(F.broadcast(pops)).select(
        "variant_id",
        "population",
        "source",
        (((F.col("variant_id") * F.col("salt")) % 100) / 100.0).alias("af"),
    )


SQL_EXPORT_POPFREQS = f"""
  SELECT variant_id, population, source,
         ((variant_id * salt) % 100) / 100.0 AS af
  FROM ({SQL_VARIANTS})
  CROSS JOIN (VALUES ('NFE','gnomAD_v3',1), ('AFR','gnomAD_v3',2),
                     ('EAS','gnomAD_v3',3), ('NFE','other_source',4))
       AS p(population, source, salt)
"""


def q_gx_prs_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.plans.views import prs_candidate_variants

    out = prs_candidate_variants(
        export_variants(spark, sf_dir),
        population_frequencies=export_popfreqs(spark, sf_dir),
        gwas_stats=export_stats(spark, sf_dir),
    )
    return out.select(
        "variant_id", "chrom", "pos", "rs_id", "info_score", "call_rate",
        "hwe_p", "maf", "gnomad_nfe_af", "gnomad_afr_af", "gnomad_eas_af",
        "beta", "standard_error", "p_value",
    )


Q_GX_PRS_CANDIDATES_SQL = f"""
WITH v AS ({SQL_EXPORT_VARIANTS}),
pf AS (
  SELECT variant_id,
         MAX(CASE WHEN population = 'NFE' THEN af END) AS gnomad_nfe_af,
         MAX(CASE WHEN population = 'AFR' THEN af END) AS gnomad_afr_af,
         MAX(CASE WHEN population = 'EAS' THEN af END) AS gnomad_eas_af
  FROM ({SQL_EXPORT_POPFREQS})
  WHERE source = 'gnomAD_v3' AND population IN ('NFE', 'AFR', 'EAS')
  GROUP BY variant_id
),
s AS ({SQL_EXPORT_STATS})
SELECT v.variant_id, v.chrom, v.pos, v.rs_id, v.info_score, v.call_rate,
       v.hwe_p, v.maf, pf.gnomad_nfe_af, pf.gnomad_afr_af, pf.gnomad_eas_af,
       s.beta, s.standard_error, s.p_value
FROM v
LEFT JOIN pf USING (variant_id)
JOIN s USING (variant_id)
WHERE v.in_hapmap3 AND v.info_score >= 0.6 AND v.call_rate >= 0.98
  AND v.hwe_p > 0.000001 AND v.maf >= 0.01
"""


QUERIES = {
    "q_export_plink": q_export_plink,
    "q_export_prs_cs": q_export_prs_cs,
    "q_export_ldpred2": q_export_ldpred2,
    "q_export_prsice2": q_export_prsice2,
    "q_gx_prs_candidates": q_gx_prs_candidates,
}

ORACLE = {
    "q_export_plink": Q_EXPORT_PLINK_SQL,
    "q_export_prs_cs": Q_EXPORT_PRS_CS_SQL,
    "q_export_ldpred2": Q_EXPORT_LDPRED2_SQL,
    "q_export_prsice2": Q_EXPORT_PRSICE2_SQL,
    "q_gx_prs_candidates": Q_GX_PRS_CANDIDATES_SQL,
}
