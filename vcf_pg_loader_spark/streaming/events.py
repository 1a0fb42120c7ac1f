"""Structured-Streaming ingestion for the events table.

The reference has no true streaming (SURVEY §2.9 — its "streaming" is
memory-bounded batch iteration), so this module is the engine's
forward-looking extension: the same events-table aggregations served
incrementally.

  file source → watermark → windowed aggregate → sink

`Trigger.AvailableNow` (used by the tests) drains whatever data exists
and stops — which makes the streaming pipeline exactly reproducible on
the driver fixtures while remaining a real incremental query on a
cluster fed by a live source (Kafka/files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events parquet/json drops."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts with late-data handling.

    The watermark bounds state: aggregates for windows older than the
    watermark are finalized and evicted — this is what makes the
    aggregation runnable forever at scale."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def run_available_now(
    result: DataFrame, checkpoint: str, out_path: str
) -> None:
    """Drain all available input once (reproducible batch-equivalent run)
    and write the aggregate to parquet."""
    q = (
        result.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
