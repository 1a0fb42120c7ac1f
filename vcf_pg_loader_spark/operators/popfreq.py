"""Population allele frequencies: gnomAD INFO extraction, long-format
frequency table, popmax.

Reference semantics: annotations/population_freq.py — per-population
AF_/AC_/AN_/nhomalt_ INFO fields (parse_gnomad_info :64-134), popmax
excluding bottlenecked ASJ/FIN (:172-216), upsert import (:270-361).

Spark shape: one wide→long unpivot per population set (stack), then
popmax is a grouped max_by — the whole import is two expressions, no
per-variant Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GNOMAD_POPULATIONS = ["AFR", "AMR", "ASJ", "EAS", "FIN", "NFE", "SAS"]
BOTTLENECKED_POPULATIONS = {"ASJ", "FIN"}


def gnomad_frequencies_long(
    variants: DataFrame,
    source: str = "gnomAD_v3",
    info_col: str = "info",
    key: list[str] | None = None,
) -> DataFrame:
    """Extract per-population frequencies from the INFO map into long
    format: (key..., population, source, af, ac, an, nhomalt)."""
    key = key or ["chrom", "pos", "ref", "alt"]
    info = F.col(info_col)
    rows = []
    for pop in GNOMAD_POPULATIONS:
        low = pop.lower()
        rows.append(
            F.struct(
                F.lit(pop).alias("population"),
                F.coalesce(info[f"AF_{low}"], info[f"gnomad_af_{low}"])
                .try_cast("double")
                .alias("af"),
                F.coalesce(info[f"AC_{low}"], info[f"gnomad_ac_{low}"])
                .try_cast("bigint")
                .alias("ac"),
                F.coalesce(info[f"AN_{low}"], info[f"gnomad_an_{low}"])
                .try_cast("bigint")
                .alias("an"),
                info[f"nhomalt_{low}"].try_cast("bigint").alias("nhomalt"),
            )
        )
    exploded = variants.select(
        *key, F.explode(F.array(*rows)).alias("p")
    ).select(
        *key,
        F.col("p.population").alias("population"),
        F.lit(source).alias("source"),
        F.col("p.af").alias("af"),
        F.col("p.ac").alias("ac"),
        F.col("p.an").alias("an"),
        F.col("p.nhomalt").alias("nhomalt"),
    )
    return exploded.filter(
        F.col("af").isNotNull()
        | F.col("ac").isNotNull()
        | F.col("an").isNotNull()
    )


def popmax(
    frequencies: DataFrame,
    key: list[str] | None = None,
    exclude_bottlenecked: bool = True,
) -> DataFrame:
    """Per-variant popmax AF + population (population_freq.py:172-216).

    max_by keeps the argmax population; ties broken by population name
    for determinism.
    """
    key = key or ["chrom", "pos", "ref", "alt"]
    df = frequencies
    if exclude_bottlenecked:
        df = df.filter(~F.col("population").isin(*BOTTLENECKED_POPULATIONS))
    df = df.filter(F.col("af").isNotNull())
    return df.groupBy(*key).agg(
        F.max("af").alias("popmax_af"),
        F.expr("max_by(population, struct(af, population))").alias("popmax_population"),
    )
