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


def rank_split_bounds(
    partials: DataFrame, n_ranges: int, **hdr_kwargs
) -> list[float]:
    """Range-split bounds for `global_rank` served from an HDR sketch
    (operators/histogram.py hdr_partial over the rank key): the (i/n)-
    quantile estimates, WITHOUT the sampling pass repartitionByRange
    would run — and reusable/mergeable across calls, unlike a sample.
    Driver-side list of n_ranges-1 floats: control-plane tiny.

    Caveat (measured, tests/test_round8.py): the HDR sketch is LOG-
    bucketed — resolution is RELATIVE (2^-sub_bits per octave), so it
    cannot split a dense run of near-equal keys, e.g. a tie-heavy
    composite key v·2^24+id whose id spread is parts-per-million of the
    value.  For tie-splitting bounds use `hash_sample_bounds`, whose
    resolution lives in rank space."""
    from vcf_pg_loader_spark.operators.histogram import hdr_range_bounds

    return [
        float(r.bound)
        for r in hdr_range_bounds(partials, n_ranges, **hdr_kwargs)
        .orderBy("q")
        .collect()
    ]


def hash_sample_bounds(
    df: DataFrame,
    key_col: str,
    n_ranges: int,
    k: int = 4096,
    uniq_col: str | None = None,
) -> list[float]:
    """Range-split bounds from a DETERMINISTIC bottom-k-by-hash row
    sample of the rank key — the KMV order-statistics idea (Beyer 2007,
    operators/sketch.py) moved from distinct-counting to rank space:
    keep the k rows whose hash is smallest (a uniform row sample, since
    the hash is uniform and independent of the key order), then read
    the (i/n)-quantiles off the sample.

    The hash covers (key, uniq_col) when `uniq_col` names a per-row
    unique column, which keeps the sample row-uniform even when many
    rows share a key VALUE.  Without it the hash is of the key alone,
    so all rows sharing a value enter or leave the sample as ONE unit —
    fine only when key_col is (near-)distinct per row; under tie-heavy
    keys a value-level sample over-weights hot values in rank space and
    the bounds skew.  Callers with duplicate keys must pass uniq_col
    (length_batches passes its id column).

    Why not the HDR sketch: its log buckets resolve RELATIVE differences
    (~3%), so a tie-heavy composite key — 90% of rows at v*·2^24 plus a
    tiny id offset — collapses into one bucket and the bounds cannot
    split the tie run.  The hash sample's error is in RANK units,
    O(n_ranges/sqrt(k)) imbalance, regardless of how the key values
    cluster.  Mergeable (bottom-k of a union = bottom-k of the merged
    bottom-ks) and deterministic, unlike repartitionByRange's reservoir.
    Driver footprint: k values — control-plane tiny."""
    hash_cols = [F.col(key_col)]
    if uniq_col is not None:
        hash_cols.append(F.col(uniq_col))
    sample = (
        df.select(F.col(key_col).alias("_k"), F.xxhash64(*hash_cols).alias("_h"))
        .orderBy("_h")
        .limit(k)
    )
    keys = sorted(r._k for r in sample.collect())
    if not keys:
        return []
    return [
        float(keys[min(int(len(keys) * i / n_ranges), len(keys) - 1)])
        for i in range(1, n_ranges)
    ]


def global_rank(
    df: DataFrame,
    order_cols: list[tuple[str, bool]],
    rank_col: str = "rank",
    num_ranges: int | None = None,
    split_col: str | None = None,
    split_bounds: list[float] | None = None,
) -> DataFrame:
    """Dense global ROW_NUMBER under (col, ascending) specs — identical
    output to the single-partition window, computed with range
    partitioning + per-partition offsets.  order_cols must be a TOTAL
    order (include a tie-breaker) or ranks of ties are partitioner-
    dependent.

    Default partitioning is `repartitionByRange` (reservoir sampling).
    When the caller has a sketch of the rank key, pass `split_col` (a
    numeric column that encodes the total order monotonically — or any
    PREFIX of it) plus `split_bounds` (`rank_split_bounds`): rows are
    assigned pid = #bounds below the key, so balance comes from the
    sketch's quantiles instead of a sampling pass, ties sharing a key
    value stay rank-exact by construction, AND one exchange disappears
    (the explicit pid feeds the window's hash exchange directly; the
    range shuffle never happens)."""
    sort_exprs = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols
    ]
    if split_bounds is not None:
        if split_col is None:
            raise ValueError("split_bounds requires split_col")
        pid = sum(
            (F.col(split_col) > F.lit(float(b))).cast("int")
            for b in split_bounds
        ) if split_bounds else F.lit(0)
        parted = df.withColumn("_pid", pid)
    else:
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
    use_sketch_bounds: bool = False,
    num_ranges: int | None = None,
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
    order = [("n_tokens", True), (id_col, True)]
    if use_sketch_bounds:
        # encode the (n_tokens, id) total order in one sortable bigint
        # and partition on sketch quantiles of it: ties on n_tokens
        # split by id across partitions (the tie-heavy-skew fix), the
        # bounds come from the deterministic mergeable hash sample, and
        # repartitionByRange's sampling pass disappears
        # ids beyond 2^24 saturate: _skey stays MONOTONE in the total
        # order (saturated ids share one pid — mildly less balance,
        # never a wrong rank; a modulo would wrap and break
        # monotonicity)
        key = (
            F.col("n_tokens").cast("bigint") * F.lit(1 << 24)
            + F.least(
                F.col(id_col).cast("bigint"), F.lit((1 << 24) - 1)
            )
        )
        keyed = t.withColumn("_skey", key)
        n = num_ranges or docs.sparkSession.sparkContext.defaultParallelism
        # uniq_col keeps the sample row-uniform even where _skey
        # saturates (ids beyond 2^24 share one _skey value)
        bounds = hash_sample_bounds(keyed, "_skey", n, uniq_col=id_col)
        ranked = global_rank(
            keyed, order, split_col="_skey", split_bounds=bounds
        ).drop("_skey")
    else:
        ranked = global_rank(t, order)
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
