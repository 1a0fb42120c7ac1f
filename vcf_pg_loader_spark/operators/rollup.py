"""Incremental time-bucketed rollups (continuous-aggregate maintenance).

A rollup at 100 TB is never recomputed from scratch: the engine keeps a
PARTIAL state per (bucket, group) — mergeable accumulators only — and
folds each new micro-batch/day of events into it.  This module provides
the three pieces:

  event_rollup_partial : events -> partial state (one shuffle, map-side
                         combined)
  merge_rollup         : partial ⊎ partial -> partial (union + one
                         re-aggregation keyed on the bucket — the only
                         shuffle is on the tiny rollup keyspace)
  rollup_final         : partial -> user-facing frame

Correctness property (oracle-checked by q_rollup_incremental): for any
split of the input, ``final(merge(partial(a), partial(b))) ==
final(partial(a ∪ b))`` — bit-exact, because every accumulator is either
an integer count, a min/max, or a DECIMAL sum (associative/commutative;
see queries/_util.py).  COUNT(DISTINCT ...) is deliberately absent: it
is not mergeable; a production rollup carries an HLL sketch instead
(approx_count_distinct) and documents the error bound.

The reference has no incremental maintenance — its materialized views
are full recomputes on refresh (views/prs_views.py:133-159); this is the
scale path that replaces them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact mergeable accumulator for SUM(double): per-row decimal cast, sums
# of which associate exactly (queries/_util.py rationale)
_DEC = "decimal(28,12)"

_KEYS = ["bucket", "event_type"]


def event_rollup_partial(
    events: DataFrame, bucket: str = "hour"
) -> DataFrame:
    """Partial rollup state for a batch of events.

    One hash aggregation; Spark's partial/final split map-side-combines
    before the shuffle, so the exchanged volume is O(|buckets| ×
    |event types|) per input partition, not O(rows).
    """
    return events.groupBy(
        F.date_trunc(bucket, F.col("ts")).alias("bucket"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("_sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def merge_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a new partial into an existing one.

    Decimal sums re-sum exactly; counts add; min/max re-min/max.  The
    shuffle is keyed on the rollup keyspace — tiny and stable no matter
    how large the underlying event stream grows.
    """
    return (
        existing.unionByName(delta)
        .groupBy(*_KEYS)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_value").cast(_DEC).alias("_sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_final(partial: DataFrame) -> DataFrame:
    """User-facing view of the partial state."""
    return partial.select(
        "bucket",
        "event_type",
        "n_events",
        F.col("_sum_value").cast("double").alias("total_value"),
        "min_value",
        "max_value",
    )
