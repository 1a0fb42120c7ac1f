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


# ---------------------------------------------------------------------------
# custom stateful operator: per-user gap sessionization via
# applyInPandasWithState — the streaming twin of the batch lag-window
# sessionization (queries/core.py q_events_sessions).  State per user is
# four scalars; event-time timeout closes a session once the watermark
# passes last_event + gap, which is what bounds state at 100 TB.
# ---------------------------------------------------------------------------
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, tv double"


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Closed sessions per user: events separated by more than
    `gap_minutes` start a new session; a session is emitted when the
    event-time watermark passes its last event + gap."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        out = []
        if state.hasTimedOut:
            start_us, last_us, n, tv = state.get
            out.append((user_id, start_us, last_us, n, tv))
            state.remove()
        else:
            frames = [pdf for pdf in pdfs if len(pdf)]
            if frames:
                data = pd.concat(frames).sort_values("ts")
                if state.exists:
                    start_us, last_us, n, tv = state.get
                else:
                    start_us = last_us = None
                    n, tv = 0, 0.0
                for ts, val in zip(data["ts"], data["value"]):
                    us = int(pd.Timestamp(ts).value // 1_000)
                    if last_us is not None and us - last_us > gap_us:
                        out.append((user_id, start_us, last_us, n, tv))
                        start_us, n, tv = us, 0, 0.0
                    if start_us is None:
                        start_us = us
                    last_us = max(last_us, us) if last_us is not None else us
                    n += 1
                    tv += float(val) if pd.notna(val) else 0.0
                state.update((start_us, last_us, n, tv))
                # close once the watermark passes last + gap; the timeout
                # API is millisecond-granular and must sit strictly above
                # the current watermark
                state.setTimeoutTimestamp(
                    max(
                        (last_us + gap_us + 999) // 1000,
                        state.getCurrentWatermarkMs() + 1000,
                    )
                )
        yield pd.DataFrame(
            [
                (
                    u,
                    pd.Timestamp(s, unit="us"),
                    pd.Timestamp(e, unit="us"),
                    n_,
                    tv_,
                )
                for (u, s, e, n_, tv_) in out
            ],
            columns=[
                "user_id", "session_start", "session_end", "n_events",
                "total_value",
            ],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of :func:`sessionize_stream` (lag-window boundaries) —
    the equivalence oracle for the stateful streaming operator."""
    from pyspark.sql.window import Window

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.withColumn(
        "_new",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
            > gap_us
        ).cast("int"),
    ).withColumn(
        "_sid",
        F.sum(F.coalesce(F.col("_new"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return marked.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
    ).drop("_sid")
