"""Parallelism guard for compute-heavy narrow transforms.

A small parquet file scans as ONE task; an explode/hash pipeline chained
onto it then runs on one core no matter how many are idle.  At real scale
the scan already has thousands of partitions and a repartition would be a
pure pessimization — so we only widen when the scan is narrower than the
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition up to default parallelism — only if the
    plan currently has fewer partitions than cores."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
