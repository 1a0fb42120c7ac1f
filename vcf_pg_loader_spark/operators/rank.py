"""Distributed global ranking and length-bucketed training batches.

`ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY funnels the
whole dataset through ONE task — the classic scale cliff (Spark even
logs "No Partition Defined for Window operation").  The scalable shape
is the zipWithIndex idea expressed relationally:

  1. range-partition on the FULL order spec (keys + tie-breakers, so
     equal-prefix rows cannot straddle a boundary out of order);
  2. row_number within each range partition (keyed window — parallel);
  3. add each partition's cumulative row-count offset, carried as a
     broadcast partition-count-sized frame (control-plane tiny).

Costs two data exchanges (the range shuffle, then the window's hash
exchange on the partition id) — but every stage is fully parallel and
spill-safe, vs. one exchange into a single sorting task.  The same
per-shard-offset trick drives chunking and epoch shuffle
(operators/chunking.py); this module is its general ranking form.

`length_batches` builds on it: documents ranked by token count and cut
into k equal batches — length-bucketed batching, the padding-efficiency
primitive of every LLM training loader (short docs batch with short
docs, so per-batch padding waste is bounded by the bucket's length
spread instead of the corpus max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    rank_col: str = "rank",
    num_ranges: int | None = None,
) -> DataFrame:
    """Dense global ROW_NUMBER under (col, ascending) specs — identical
    output to the single-partition window, computed with range
    partitioning + per-partition offsets.  order_cols must be a TOTAL
    order (include a tie-breaker) or ranks of ties are partitioner-
    dependent."""
    sort_exprs = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols
    ]
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *sort_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # cumulative offsets over the partition-count-sized frame: the
    # single-partition window here is over <= num_ranges rows, not data
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_pid").orderBy(*sort_exprs)
    return (
        parted.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )


def length_batches(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut the corpus into k length-sorted batches and report each
    batch's padding-relevant stats: (batch_id, n_docs, min_tokens,
    max_tokens, total_tokens).  batch_id = floor((rank-1)·k/N) + 1 over
    the (token count, id) total order — rank-balanced (sizes differ by
    at most one), so the cut depends on every rank being right."""
    from vcf_pg_loader_spark.operators.text import token_count

    t = docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    )
    ranked = global_rank(t, [("n_tokens", True), (id_col, True)])
    n_total = t.agg(F.count(F.lit(1)).alias("_n_total"))
    batch = (
        F.floor(
            (F.col("rank") - 1).cast("double")
            * F.lit(float(k))
            / F.col("_n_total").cast("double")
        )
        + 1
    ).cast("int")
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(batch.alias("batch_id"), "n_tokens")
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("total_tokens"),
        )
    )


def sql_length_batches(table: str, k: int) -> str:
    """DuckDB twin: plain global ROW_NUMBER (fine at oracle scale) with
    the identical double-arithmetic batch cut."""
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM {table}
),
r AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rank
  FROM t
),
n AS (SELECT COUNT(*) AS n_total FROM t)
SELECT CAST(FLOOR(CAST(rank - 1 AS DOUBLE) * {float(k)}
                  / CAST(n_total AS DOUBLE)) + 1 AS INT) AS batch_id,
       COUNT(*) AS n_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM r, n
GROUP BY 1
"""
