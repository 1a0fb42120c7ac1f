"""SparkSession factory tuned for both local testing and cluster scale.

Every knob here is chosen for the 100 TB target, not just local[32]:
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
    and dynamic broadcast conversion replace hand-tuned partition counts.
  - shuffle.partitions is a *default*; AQE coalesces it down at small SF
    and the advisory partition size governs it at large SF.
  - Arrow enabled for the few pandas_udf paths (HWE, multimodal stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "vcf-pg-loader-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-minded defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # --- adaptive execution: the scale story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # --- scans --------------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver fixtures store event timestamps as parquet
        # TIMESTAMP(NANOS); Spark has no nanos type, so read them as long
        # and convert explicitly (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- joins / shuffle wire (guide §3.1/§2.3/§9) --------------------
        # Parameterized, not local[32]-tuned.  Both knobs were A/B'd at
        # sf0.1 (OPTIMIZATION_r15.md "Global session conf A/B"):
        # preferSortMergeJoin=false measured NEUTRAL over the full
        # registry once run-order bias was cancelled (AQE already
        # broadcast-converts the eligible joins here), and zstd measured
        # neutral-to-slightly-worse (shuffles are small, the extra CPU
        # buys nothing locally).  Defaults therefore stay at Spark's
        # (true / lz4); the env overrides exist for cluster deployments
        # where the trade-offs flip (network-bound shuffles favor
        # zstd's ratio; bounded post-AQE partitions make shuffled-hash
        # safe — measure there, §2.3).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        # --- python interop ----------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
