"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the single right row with the greatest event
time <= the left row's time (direction="backward"; "forward" takes the
smallest >=), within the same `by` group.  The classic shapes: trade →
prevailing quote, event → most recent account state, measurement →
latest calibration.

Implementation is the UNION-SORT form, not a range join: tag both
sides, union them, and carry the latest right payload forward with one
running `last(ignorenulls)` window per `by` group.

Why this is the 100 TB shape: the cost is ONE shuffle of (left + right)
keyed on `by` plus a per-key sort — exactly a sort-merge join's cost —
and it never materializes candidate pairs.  The naive alternative
(theta-join on ts <= ts, then argmax per left row) explodes to
O(|left| × |right matches|) intermediate rows per key before pruning.
A per-key sort is also skew-bounded by the hottest single key, same as
any keyed window; salt `by` upstream if one group dominates.

Ties: right rows sort BEFORE left rows at equal timestamps, so a right
row at exactly the left timestamp matches (inclusive, matching DuckDB's
ASOF `l.ts >= r.ts`).  Multiple right rows at the same (by, ts) are the
caller's ambiguity — dedupe first for deterministic output.

The reference has no as-of join (SURVEY §2.3: "no as-of joins"); this
is part of the engine's beyond-reference operator surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    direction: str = "backward",
    tolerance=None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right payload
    (all non-key right columns) as `{prefix}<col>`, and the matched
    right timestamp as `{prefix}{ts_col}` (null when no match).

    tolerance: optional Column (e.g. ``F.expr("INTERVAL '1' HOUR")``);
    matches farther than this from the left timestamp are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    payload_cols = [c for c in right.columns if c not in (*by, ts_col)]
    # Null timestamps never participate in an as-of match (DuckDB ASOF
    # semantics): a null right ts would otherwise sort first under asc
    # nulls-first and leak its payload into early left rows; a null left
    # ts is guarded below.  Same null-drop rationale as kmv_sketch.
    r = right.filter(F.col(ts_col).isNotNull()).select(
        *by,
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias("_ts"), *[F.col(c) for c in payload_cols]
        ).alias("_r"),
        F.lit(0).alias("_side"),
    )
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(r.schema["_r"].dataType)
    )
    both = l_tagged.unionByName(r, allowMissingColumns=True)

    ts_order = F.asc(ts_col) if direction == "backward" else F.desc(ts_col)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn("_m", F.last("_r", ignorenulls=True).over(w))

    out = carried.filter(F.col("_side") == 1)
    # A left row with a null ts has no well-defined "as of" point: null
    # the match out (under forward/desc it would sort nulls-last and
    # wrongly inherit the running payload).
    out = out.withColumn(
        "_m", F.when(F.col(ts_col).isNotNull(), F.col("_m"))
    )
    if tolerance is not None:
        gap = (
            F.col(ts_col) - F.col("_m._ts")
            if direction == "backward"
            else F.col("_m._ts") - F.col(ts_col)
        )
        out = out.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    return out.select(
        *left.columns,
        F.col("_m._ts").alias(f"{prefix}{ts_col}"),
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
