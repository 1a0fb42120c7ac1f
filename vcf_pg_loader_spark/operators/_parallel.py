"""Parallelism guard for compute-heavy narrow transforms.

A small parquet file scans as ONE task; an explode/hash pipeline chained
onto it then runs on one core no matter how many are idle.  At real scale
the scan already has thousands of partitions and a repartition would be a
pure pessimization — so we only widen when the scan is narrower than the
cluster.  Inputs on remote filesystems (s3/hdfs/abfs) are treated as
already-wide: at 100 TB the scan is never narrower than the cluster, and
probing partition counts there would force an RDD plan translation.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 << 20

# Compression formats Spark cannot split: one scan task per file no matter
# the size.  (bgzip also ends in .gz — see sources/bgzf.py for the
# splittable path.)
_NON_SPLITTABLE_SUFFIXES = (".gz", ".bz2", ".zst", ".lz4", ".deflate", ".snappy")


def _parse_bytes(v: str) -> int:
    try:
        v = v.strip().lower()
        core = v[:-1] if v.endswith("b") and len(v) > 1 else v
        for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
            if core.endswith(suffix):
                return int(float(core[: -len(suffix)]) * mult)
        return int(float(v[:-1] if v.endswith("b") else v))
    except (ValueError, AttributeError):
        return _DEFAULT_MAX_PARTITION_BYTES


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Split-count estimate from the scan's file listing — no RDD
    conversion (an RDD probe would force plan translation per call).  Returns
    None when the estimate can't be made cheaply (caller no-ops)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    max_bytes = max(
        _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        ),
        1,
    )
    splits = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return None
        path = u.path or f
        if not os.path.exists(path):
            return None
        if path.lower().endswith(_NON_SPLITTABLE_SUFFIXES):
            splits += 1  # gzip & friends: one task per file, size irrelevant
        else:
            splits += max(1, math.ceil(os.path.getsize(path) / max_bytes))
    return splits


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition up to default parallelism — only if the
    scan is provably narrower than the cluster.  Remote inputs and
    un-estimable plans pass through unchanged (assumed already wide)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    est = _estimated_scan_partitions(df)
    if est is not None and est < target:
        return df.repartition(target)
    return df
