"""Upsert/merge semantics on plain Parquet frames.

The reference leans on Postgres `ON CONFLICT` (SURVEY §4): DO NOTHING
for annotations (annotation_loader.py:166-170), DO UPDATE for GWAS
stats / genotypes / population frequencies (gwas/loader.py:467-491,
genotypes/genotype_loader.py:343-375, annotations/population_freq.py:
270-283).  Spark has no in-place update, so merge is expressed as set
algebra — both variants are single-shuffle plans:

  insert-only (DO NOTHING): new rows anti-joined against existing keys,
    then unioned.
  upsert (DO UPDATE): union tagged by source priority, keep the highest-
    priority row per key via one row_number window.

Determinism: ties are impossible by construction (priority + a stable
tiebreaker), so re-running a merge yields byte-identical results — the
property the oracle harness and idempotent reloads both need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_insert_only(
    existing: DataFrame, incoming: DataFrame, key: list[str]
) -> DataFrame:
    """ON CONFLICT DO NOTHING: keep existing rows, add unseen keys.

    Incoming duplicates (same key appearing twice in one batch) collapse
    to one arbitrary-but-deterministic row first (dropDuplicates on key
    after a sort-free min-struct pick is overkill here; the reference
    also keeps "first wins").
    """
    fresh = incoming.dropDuplicates(key).join(
        existing.select(*key), key, "left_anti"
    )
    return existing.unionByName(fresh, allowMissingColumns=True)


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    key: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """ON CONFLICT DO UPDATE: incoming wins over existing per key.

    order_col (optional): within each source, higher value wins (e.g. a
    load timestamp); falls back to arbitrary-but-deterministic ordering
    over the remaining columns via a stable struct sort.
    """
    tagged = existing.withColumn("_prio", F.lit(0)).unionByName(
        incoming.withColumn("_prio", F.lit(1)), allowMissingColumns=True
    )
    order = [F.desc("_prio")]
    if order_col:
        order.append(F.desc(order_col))
    # stable final tiebreaker: the full row rendered to one sortable string
    other_cols = [c for c in tagged.columns if c not in (*key, "_prio")]
    order.append(F.desc(F.to_json(F.struct(*[F.col(c) for c in other_cols]))))
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )
