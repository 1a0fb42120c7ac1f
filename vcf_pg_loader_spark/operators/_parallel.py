"""Parallelism guard for compute-heavy narrow transforms.

A small parquet file scans as ONE task; an explode/hash pipeline chained
onto it then runs on one core no matter how many are idle.  At real scale
the scan already has thousands of partitions and a repartition would be a
pure pessimization — so we only widen when the scan is narrower than the
cluster.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def _parse_bytes(v: str) -> int:
    v = v.strip().lower()
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)])) * mult
    return int(v)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Split-count estimate from the scan's file listing — no RDD
    conversion (df.rdd would force plan translation per call).  Returns
    None when the sources aren't local files (caller falls back)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        path = u.path or f
        if not os.path.exists(path):
            return None
        total += os.path.getsize(path)
    max_bytes = _parse_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    return max(len(files), math.ceil(total / max(max_bytes, 1)))


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition up to default parallelism — only if the
    scan is narrower than the cluster."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    est = _estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df
