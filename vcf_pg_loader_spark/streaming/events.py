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
# Parallel arrays of PENDING sessions (start_us, end_us, n, total_value):
# a session stays in state until the watermark passes end + gap, so late
# events inside the allowed lateness can still merge into (or bridge)
# not-yet-emitted sessions.  State per user is bounded by the number of
# sessions inside one watermark horizon, not by event count.
SESSION_STATE_SCHEMA = (
    "ss array<bigint>, es array<bigint>, ns array<bigint>, tvs array<double>"
)


def _merge_sessions(sessions: list[list], gap_us: int) -> list[list]:
    """Interval-merge [start, end, n, tv] rows whose gap is <= gap_us.
    Handles late events lowering a session start and bridging two
    previously separate sessions."""
    sessions.sort(key=lambda s: (s[0], s[1]))
    merged: list[list] = []
    for s in sessions:
        if merged and s[0] - merged[-1][1] <= gap_us:
            last = merged[-1]
            last[1] = max(last[1], s[1])
            last[2] += s[2]
            last[3] += s[3]
        else:
            merged.append(list(s))
    return merged


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Closed sessions per user: events separated by more than
    `gap_minutes` start a new session.

    A session is emitted ONLY once the event-time watermark passes its
    last event + gap — never while a batch is being processed — so with
    any `watermark` (allowed lateness), a late event arriving within
    that lateness merges into the still-held session instead of
    producing a split.  Emitted output therefore matches
    :func:`sessionize_batch` exactly for every event no later than the
    watermark (later-than-watermark rows are dropped by Spark's late
    filter, as in any watermarked aggregation)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user_id = int(key[0])
        wm_us = state.getCurrentWatermarkMs() * 1000
        sessions: list[list] = []
        if state.exists:
            ss, es, ns, tvs = state.get
            sessions = [list(t) for t in zip(ss, es, ns, tvs)]
        if not state.hasTimedOut:
            for pdf in pdfs:
                for ts, val in zip(pdf["ts"], pdf["value"]):
                    us = int(pd.Timestamp(ts).value // 1_000)
                    tv = float(val) if pd.notna(val) else 0.0
                    sessions.append([us, us, 1, tv])
            sessions = _merge_sessions(sessions, gap_us)
        out = [s for s in sessions if s[1] + gap_us <= wm_us]
        keep = [s for s in sessions if s[1] + gap_us > wm_us]
        if keep:
            state.update(
                (
                    [int(s[0]) for s in keep],
                    [int(s[1]) for s in keep],
                    [int(s[2]) for s in keep],
                    [float(s[3]) for s in keep],
                )
            )
            # wake when the earliest pending session becomes emittable;
            # the timeout API is ms-granular and must sit strictly above
            # the current watermark
            deadline_ms = min(s[1] + gap_us for s in keep) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_us // 1000 + 1000))
        else:
            state.remove()
        yield pd.DataFrame(
            [
                (
                    user_id,
                    pd.Timestamp(s, unit="us"),
                    pd.Timestamp(e, unit="us"),
                    int(n_),
                    float(tv_),
                )
                for (s, e, n_, tv_) in out
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

    w = Window.partitionBy("user_id").orderBy("ts")
    # Timestamp subtraction yields a day-time interval for both TIMESTAMP
    # and TIMESTAMP_NTZ; unix_micros would reject the NTZ type that
    # parquet scans infer for tz-less columns.
    gap = F.expr(f"INTERVAL '{int(gap_minutes) * 60}' SECOND")
    marked = events.withColumn(
        "_new",
        (F.col("ts") - F.lag(F.col("ts")).over(w) > gap).cast("int"),
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


# ---------------------------------------------------------------------------
# exact dedup on ingest
# ---------------------------------------------------------------------------
def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each key; drop replays forever after
    (within the watermark horizon).

    At-least-once sources (Kafka redelivery, file-drop retries) make
    ingest dedup the first stage of any streaming pipeline.
    `dropDuplicatesWithinWatermark` keys state by `key_cols` and evicts
    an entry once the event-time watermark passes its timestamp plus the
    delay — state is bounded by the duplicate arrival horizon, not by
    stream length, which is what lets this run forever at 100 TB/day.
    (Plain `dropDuplicates` on a stream never evicts; never use it in
    production streams.)
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )
