"""Stream-stream interval join with watermark-bounded state.

Joining two live streams (clicks to the purchases that follow within an
attribution window, impressions to conversions, reads to quality
events) requires both sides to buffer rows in the state store until the
other side's matches can no longer arrive.  Unbounded buffering is the
failure mode; the two bounds below make it runnable forever:

  1. both inputs carry an event-time watermark (how late a row may be);
  2. the join condition carries a TIME-RANGE constraint tying the two
     event times together.

From those, Spark derives exactly how long each side's rows must stay
in state and evicts the rest — state is O(rate × (watermark + window)),
independent of stream length.  A stream-stream join WITHOUT the range
constraint keeps every row forever; never ship one.

The reference has no streaming at all (SURVEY §2.9); this extends the
engine's Structured-Streaming surface next to the watermarked
aggregations, stateful sessionization, and exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Rows of `right` within (left.ts, left.ts + within] per key —
    e.g. purchases attributed to a preceding click.  Works identically
    on batch frames (the equivalence oracle in tests) and on streams,
    where the watermark + range constraint bound the join state.

    Both inputs need columns (key, ts, ...); output columns are
    prefixed to keep the two sides apart."""
    l = left.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != key],
    ).withWatermark(f"{left_prefix}ts", watermark)
    r = right.select(
        F.col(key).alias("_kr"),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c != key
        ],
    ).withWatermark(f"{right_prefix}ts", watermark)
    lts, rts = F.col(f"{left_prefix}ts"), F.col(f"{right_prefix}ts")
    cond = (
        (F.col("_k") == F.col("_kr"))
        & (rts > lts)
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .withColumnRenamed("_k", key)
        .drop("_kr")
    )
