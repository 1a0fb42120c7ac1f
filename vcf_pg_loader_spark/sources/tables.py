"""Loaders for the driver's TPC-H-ish parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings.  One parquet file per table under the sf dir.

Scale note: `spark.read.parquet` gives splittable columnar scans with
predicate pushdown and column pruning; at 100 TB the same call reads a
directory of thousands of row-grouped files — nothing here is local-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; normalizes the events timestamp column.

    The fixture has written `events.ts` as parquet TIMESTAMP(NANOS) in
    some generations and TIMESTAMP(MICROS) without timezone (Spark:
    TIMESTAMP_NTZ) in others.  For the nanos shape Spark needs
    ``spark.sql.legacy.parquet.nanosAsLong`` and we convert the raw long
    to a microsecond TimestampType by integer division — identical to
    DuckDB's `CAST(ts AS TIMESTAMP)` truncation, so oracle comparisons
    stay exact; the micros/NTZ shape passes through unchanged (guarded
    by the dtype check below).

    Defensive conf: callers may hand us a session built without our
    factory (the driver's harness does).  Both confs are runtime-settable
    SQL confs, so pin them here — without nanosAsLong the events read
    throws PARQUET_TYPE_ILLEGAL, and a non-UTC session timezone would
    shift collected timestamps away from DuckDB's naive values.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for `spark.sql` queries
    (the raw-SQL passthrough surface; reference cli.py:1454-1502)."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
