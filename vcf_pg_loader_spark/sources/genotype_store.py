"""Genotype store: sample-hash-bucketed Parquet.

Reference layout: the genotypes table is HASH-partitioned on sample_id
into 16 partitions so per-sample aggregations parallelize
(genotypes/schema.py:17-48, partition number genotype_loader.py:189-201
`sample_id % 16`).  Spark equivalent: a persisted bucket column
`pmod(hash(sample_id), n)` used as the partition directory key — scans
filtered to one sample touch exactly one directory, and per-sample
aggregations start from a co-partitioned layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.genomics import (
    allele_balance,
    dosage_from_gp,
    gt_to_dosage,
    passes_adj,
)


def with_genotype_columns(genotypes: DataFrame) -> DataFrame:
    """Derived genotype columns: dosage (DS > GP-derived > GT CASE),
    allele balance, ADJ pass — the generated-column set from
    genotypes/schema.py:27-37."""
    dosage = F.coalesce(
        F.col("ds").cast("double"),
        dosage_from_gp(F.col("gp")),
        gt_to_dosage(F.col("gt")),
    )
    return (
        genotypes.withColumn("dosage", dosage)
        .withColumn("allele_balance", allele_balance(F.col("ad")))
        .withColumn(
            "passes_adj",
            passes_adj(F.col("gt"), F.col("gq"), F.col("dp"), F.col("ad")),
        )
    )


class GenotypeStore:
    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.path = f"{root.rstrip('/')}/genotypes"
        self.n_buckets = n_buckets

    def write(self, genotypes: DataFrame, mode: str = "append") -> None:
        df = with_genotype_columns(genotypes).withColumn(
            "sample_bucket",
            F.pmod(F.xxhash64(F.col("sample_id")), F.lit(self.n_buckets)),
        )
        (
            df.repartition(self.n_buckets, "sample_bucket")
            .write.mode(mode)
            .partitionBy("sample_bucket")
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def for_sample(self, sample_id: str) -> DataFrame:
        """Single-sample scan: prunes to one bucket directory."""
        bucket = (
            self.spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(sample_id)), F.lit(self.n_buckets)).alias("b")
            )
            .collect()[0]
            .b
        )
        return self.read().filter(
            (F.col("sample_bucket") == int(bucket))
            & (F.col("sample_id") == sample_id)
        )

    def stats(self) -> DataFrame:
        """Filtered counts + distincts (genotypes/schema.py:98-109)."""
        return self.read().agg(
            F.count(F.lit(1)).alias("n_genotypes"),
            F.countDistinct("sample_id").alias("n_samples"),
            F.count(F.when(F.col("passes_adj"), 1)).alias("n_adj_pass"),
            F.count(F.when(F.col("gt").isin("./.", ".", ".|."), 1)).alias(
                "n_missing"
            ),
        )
