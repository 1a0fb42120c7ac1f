"""Skew-safe grouped top-k: the two-stage bounded-memory pattern.

`row_number().over(partitionBy(g).orderBy(o))` sorts EVERY row of every
group — a hot group at 100 TB funnels its whole key through one task's
sort spill just to keep k rows.  The classic fix is hierarchical:

  stage 1: split each group into S salt shards; each shard keeps its
           own top-k with a bounded accumulator (array_sort + slice on
           a per-shard collect_list — memory ∝ shard size, and shards
           are 1/S of the hottest group);
  stage 2: the surviving S·k candidates per group (tiny) re-rank and
           slice to the final k.

Identical output to the window form for any deterministic total order
(the caller supplies tie-breaker columns), verified against the plain
row_number oracle (q_grouped_topk).  Spark's TakeOrderedAndProject does
exactly this for GLOBAL top-k; this operator is the grouped analogue
the physical planner does not provide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[tuple[str, bool]],
    k: int,
    payload_cols: list[str] | None = None,
    shards: int = 8,
    salt_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group under (col, ascending) order specs.

    order_cols must define a TOTAL order (add a tie-breaker column);
    payload_cols default to every non-group, non-order column.  The
    result carries group cols, order cols, payload cols, and `rn`.

    salt_col: column to derive the stage-1 shard from (defaults to the
    first order column) — any value-dependent expression works; it only
    affects intermediate balance, never the result.
    """
    if payload_cols is None:
        claimed = set(group_cols) | {c for c, _ in order_cols}
        payload_cols = [c for c in df.columns if c not in claimed]
    okeys = [c for c, _ in order_cols]

    # sort key struct: flip descending NUMERIC keys by negation is
    # type-fragile; instead array_sort on a struct of columns compares
    # field-by-field ascending, so descending columns pre-encode via a
    # rank index computed per shard... simpler and robust: sort the
    # collected array with array_sort + a comparator lambda.
    def cmp(a: Column, b: Column) -> Column:
        expr = F.lit(0)
        # build comparator right-to-left so leftmost key dominates
        for col, asc in reversed(order_cols):
            lt, gt = (-1, 1) if asc else (1, -1)
            expr = (
                F.when(a[col] < b[col], F.lit(lt))
                .when(a[col] > b[col], F.lit(gt))
                .otherwise(expr)
            )
        return expr

    salt_src = F.col(salt_col) if salt_col else F.col(okeys[0])
    salted = df.withColumn(
        "_shard", F.pmod(F.xxhash64(salt_src), F.lit(shards))
    )
    row_struct = F.struct(*[F.col(c) for c in (*okeys, *payload_cols)])

    def stage(frame: DataFrame, keys: list[str]) -> DataFrame:
        return frame.groupBy(*keys).agg(
            F.slice(
                F.array_sort(F.collect_list(row_struct), cmp), 1, k
            ).alias("_top")
        )

    s1 = stage(salted, [*group_cols, "_shard"]).select(
        *group_cols, F.explode("_top").alias("_r")
    )
    s2 = (
        s1.select(*group_cols, F.col("_r.*"))
        .groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(F.collect_list(row_struct), cmp), 1, k
            ).alias("_top")
        )
        .select(*group_cols, F.posexplode("_top").alias("_i", "_r"))
    )
    return s2.select(
        *group_cols,
        F.col("_r.*"),
        (F.col("_i") + 1).alias("rn"),
    )
