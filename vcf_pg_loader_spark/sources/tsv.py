"""Reference-dataset TSV/BED sources: GWAS-SSF, PGS Catalog, HapMap3
panels, LD blocks.

All of these are plain `spark.read.csv` scans (splittable, pushdown-
capable) with the reference's column-alias maps applied as renames — no
row-at-a-time Python (reference gwas/loader.py:203-316,
prs/pgs_catalog.py:203-342, references/hapmap3.py:116-183,
references/ld_blocks.py:46-133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# GWAS-SSF header aliases (gwas/loader.py:26-50)
GWAS_COLUMN_ALIASES = {
    "chr": "chromosome",
    "chrom": "chromosome",
    "pos": "base_pair_location",
    "position": "base_pair_location",
    "bp": "base_pair_location",
    "a1": "effect_allele",
    "ea": "effect_allele",
    "a2": "other_allele",
    "oa": "other_allele",
    "nea": "other_allele",
    "pval": "p_value",
    "pvalue": "p_value",
    "p": "p_value",
    "se": "standard_error",
    "eaf": "effect_allele_frequency",
    "freq": "effect_allele_frequency",
    "maf": "effect_allele_frequency",
    "or": "odds_ratio",
    "n_total": "n",
    "rs": "rsid",
    "snp": "rsid",
    "marker": "rsid",
}

GWAS_REQUIRED = {
    "chromosome",
    "base_pair_location",
    "effect_allele",
    "other_allele",
    "p_value",
}

# PGS Catalog harmonized-file aliases (prs/pgs_catalog.py)
PGS_COLUMN_ALIASES = {
    "rsid": "rsID",
    "chr_name": "chr_name",
    "chromosome": "chr_name",
    "chr_position": "chr_position",
    "position": "chr_position",
    "effect_allele": "effect_allele",
    "other_allele": "other_allele",
    "reference_allele": "other_allele",
    "effect_weight": "effect_weight",
    "beta": "effect_weight",
    "allelefrequency_effect": "allelefrequency_effect",
    "hm_chr": "hm_chr",
    "hm_pos": "hm_pos",
    "hm_rsid": "hm_rsID",
}


def _apply_aliases(df: DataFrame, aliases: dict[str, str]) -> DataFrame:
    for col in df.columns:
        canonical = aliases.get(col.lower().strip(), col.lower().strip())
        if canonical != col:
            df = df.withColumnRenamed(col, canonical)
    return df


def read_gwas_ssf(spark: SparkSession, path: str) -> DataFrame:
    """GWAS-SSF summary statistics: alias-mapped, typed, validated."""
    df = _apply_aliases(
        spark.read.options(sep="\t", header=True).csv(path), GWAS_COLUMN_ALIASES
    )
    missing = GWAS_REQUIRED - set(df.columns)
    if missing:
        raise ValueError(f"Missing required columns: {', '.join(sorted(missing))}")

    def opt(col: str, typ: str) -> F.Column:
        if col in df.columns:
            return F.col(col).try_cast(typ).alias(col)
        return F.lit(None).cast(typ).alias(col)

    return df.select(
        F.col("chromosome").cast("string"),
        F.col("base_pair_location").try_cast("bigint").alias("position"),
        F.upper("effect_allele").alias("effect_allele"),
        F.upper("other_allele").alias("other_allele"),
        F.col("p_value").try_cast("double").alias("p_value"),
        opt("rsid", "string"),
        opt("beta", "double"),
        opt("odds_ratio", "double"),
        opt("standard_error", "double"),
        opt("effect_allele_frequency", "double"),
        opt("n", "int"),
        opt("n_cases", "int"),
        opt("info", "double").alias("info_score"),
    ).filter(
        F.col("chromosome").isNotNull()
        & F.col("position").isNotNull()
        & F.col("effect_allele").isNotNull()
        & F.col("p_value").isNotNull()
    )


def read_pgs_header(path: str) -> dict[str, str]:
    """PGS Catalog `#key=value` metadata lines (driver-side, a few KB)."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    meta: dict[str, str] = {}
    with opener(path, "rt") as fh:
        for line in fh:
            if not line.startswith("#"):
                break
            line = line.lstrip("#").strip()
            if "=" in line:
                k, v = line.split("=", 1)
                meta[k.strip()] = v.strip()
    return meta


def read_pgs_catalog(spark: SparkSession, path: str) -> DataFrame:
    """PGS Catalog scoring file body (comment lines skipped in the scan)."""
    df = spark.read.options(sep="\t", header=True, comment="#").csv(path)
    df = _apply_aliases(df, PGS_COLUMN_ALIASES)

    cols = set(df.columns)
    chrom = F.col("hm_chr") if "hm_chr" in cols else F.col("chr_name")
    pos = F.col("hm_pos") if "hm_pos" in cols else F.col("chr_position")
    rsid = (
        F.col("hm_rsID")
        if "hm_rsid" in {c.lower() for c in cols}
        else (F.col("rsID") if "rsid" in {c.lower() for c in cols} else F.lit(None))
    )
    return df.select(
        chrom.cast("string").alias("chrom"),
        pos.try_cast("bigint").alias("pos"),
        rsid.cast("string").alias("rsid"),
        F.upper("effect_allele").alias("effect_allele"),
        (
            F.upper("other_allele")
            if "other_allele" in cols
            else F.lit(None).cast("string")
        ).alias("other_allele"),
        F.col("effect_weight").try_cast("double").alias("effect_weight"),
    ).filter(F.col("effect_weight").isNotNull())


def read_hapmap3(spark: SparkSession, path: str, build: str = "grch38") -> DataFrame:
    """HapMap3/LDpred2 panel TSV: rsid chrom position a1 a2."""
    df = spark.read.options(sep="\t", header=True).csv(path)
    return df.select(
        F.lit(f"hapmap3_{build.lower()}").alias("panel_name"),
        F.col("rsid").cast("string"),
        F.regexp_replace(F.col("chrom").cast("string"), "^chr", "").alias("chrom"),
        F.col("position").try_cast("bigint").alias("position"),
        F.upper("a1").alias("a1"),
        F.upper("a2").alias("a2"),
    )


def read_ld_blocks(
    spark: SparkSession,
    path: str,
    population: str,
    build: str = "grch37",
    source: str = "Berisa_Pickrell_2016",
) -> DataFrame:
    """Berisa-Pickrell LD block BED: chrom start end [block_id n_snps_1kg]."""
    build_norm = f"GRCh{build.upper()[4:]}" if build.upper().startswith("GRCH") else build
    df = spark.read.options(sep="\t", header=True).csv(path)
    n_snps = (
        F.col("n_snps_1kg").try_cast("int")
        if "n_snps_1kg" in df.columns
        else F.lit(None).cast("int")
    )
    return df.select(
        F.regexp_replace(F.col("chrom").cast("string"), "^chr", "").alias("chrom"),
        F.col("start").try_cast("bigint").alias("start_pos"),
        F.col("end").try_cast("bigint").alias("end_pos"),
        F.lit(population.upper()).alias("population"),
        F.lit(source).alias("source"),
        F.lit(build_norm).alias("genome_build"),
        n_snps.alias("n_snps"),
    )
