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


# ---------------------------------------------------------------------------
# Counted (Z-set) rollup: COUNT/SUM survive retractions; MIN/MAX do not.
# ---------------------------------------------------------------------------
def event_rollup_partial_counted(
    events: DataFrame, bucket: str = "hour"
) -> DataFrame:
    """Partial rollup state for a Z-SET batch of events (rows carry
    operators/ivm.py MULT; -1 retracts): counts become Σ_mult and sums
    Σ value·_mult, so a retraction batch DECREMENTS the maintained
    rollup exactly (Gupta-Mumick counting through SUM/COUNT — the
    q_ivm_agg_delete algebra applied to the continuous aggregate).

    MIN/MAX are deliberately absent: they are not retraction-invertible
    (deleting the current minimum requires the surviving multiset, which
    partial state by definition no longer has — the same reason
    COUNT(DISTINCT) is absent from the insert-only rollup).  A counted
    rollup that needs extrema keeps a per-group histogram sketch
    (operators/histogram.py) and reports quantile bounds instead."""
    from vcf_pg_loader_spark.operators.ivm import MULT

    mult = (
        F.col(MULT) if MULT in events.columns else F.lit(1).cast("bigint")
    )
    return events.groupBy(
        F.date_trunc(bucket, F.col("ts")).alias("bucket"),
        F.col("event_type"),
    ).agg(
        F.sum(mult).cast("bigint").alias("n_events"),
        F.sum((F.col("value") * mult).cast(_DEC)).alias("_sum_value"),
    )


def merge_rollup_counted(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a counted partial into the maintained state; groups whose
    count reaches zero vanish (consolidation)."""
    return (
        existing.unionByName(delta)
        .groupBy(*_KEYS)
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("_sum_value").cast(_DEC).alias("_sum_value"),
        )
        .filter(F.col("n_events") != 0)
    )


def rollup_final_counted(partial: DataFrame) -> DataFrame:
    return partial.select(
        "bucket",
        "event_type",
        "n_events",
        F.col("_sum_value").cast("double").alias("total_value"),
    )
