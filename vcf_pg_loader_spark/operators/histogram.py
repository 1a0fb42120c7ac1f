"""HDR-style histogram quantile sketch: mergeable, deterministic,
bounded relative error — the third mergeable summary beside the KMV
distinct sketch and the incremental rollups (operators/sketch.py,
operators/rollup.py).

Exact percentiles need a global sort (or percentile_disc's full
collect-per-group); at 100 TB the production answer is a histogram
sketch whose buckets merge by addition: per-partition partials combine
map-side, k-way and out-of-order, and serving a quantile reads the
cumulative histogram — O(buckets), never O(rows).  This is the
HdrHistogram / Prometheus-native-histogram design: log-spaced octaves,
`2^sub_bits` linear sub-buckets per octave, giving relative error
<= 2^-sub_bits at every magnitude (vs a fixed-width histogram whose
error explodes across scales).

Everything is INTEGER arithmetic on `floor(value * scale)` — bucket
ids, counts, cumulative ranks — plus one exactly-representable
power-of-two multiply, so Spark and DuckDB produce bit-identical
sketches and quantile estimates: the estimator is oracle-exact even
though it approximates the true quantile (error-bound tests pin the
approximation; the oracle pins the determinism).

Bit-length without floats: `length(conv(iv, 10, 2))` / `length(bin(iv))`
— transcendental-free, so no cross-engine log() ulp risk at octave
boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SUB_BITS = 5  # 32 sub-buckets per octave -> <= 3.125% relative error
SCALE = 1000  # fixed-point: floor(value * SCALE) must stay < 2^53


def _bucket_id(iv: Column, sub_bits: int) -> Column:
    """Deterministic bucket id for a positive bigint: octave = bit
    length, sub-bucket = top `sub_bits+1` bits."""
    blen = F.length(F.conv(iv.cast("string"), 10, 2)).cast("bigint")
    shift = F.greatest(blen - 1 - sub_bits, F.lit(0).cast("bigint"))
    pow2 = F.pow(F.lit(2.0), shift.cast("double"))
    top = F.floor(iv / pow2).cast("bigint")
    return blen * (1 << (sub_bits + 1)) + top


def _bucket_low(bucket: Column, sub_bits: int, scale: int) -> Column:
    """Lower bound of a bucket, back in value units (the estimate the
    quantile serve reports)."""
    width = 1 << (sub_bits + 1)
    blen = F.floor(bucket / width).cast("bigint")
    top = bucket % width
    shift = F.greatest(blen - 1 - sub_bits, F.lit(0).cast("bigint"))
    low = top * F.pow(F.lit(2.0), shift.cast("double"))
    return F.round(low / scale, 6)


def hdr_partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sub_bits: int = SUB_BITS,
    scale: int = SCALE,
    mult_col: str | None = None,
) -> DataFrame:
    """Per-group histogram partial: (group..., bucket, cnt).  Nulls and
    non-positive values are out of the sketch's domain and are dropped
    (same stance as kmv_sketch's null drop).  `mult_col` names a Z-set
    multiplicity column: bucket counts are then SIGNED sums, so a
    retraction batch decrements the histogram exactly — bucket counts
    are linear, the deletable-sketch case (unlike KMV's order
    statistics, which are not)."""
    iv = F.floor(F.col(value_col) * scale).cast("bigint")
    m = (
        F.col(mult_col).cast("bigint")
        if mult_col
        else F.lit(1).cast("bigint")
    )
    return (
        df.filter(F.col(value_col).isNotNull() & (iv > 0))
        .select(*group_cols, _bucket_id(iv, sub_bits).alias("bucket"), m.alias("_m"))
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("_m").alias("cnt"))
    )


def hdr_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Counts add — k-way, out-of-order, exactly."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_quantiles(
    partials: DataFrame,
    group_cols: list[str],
    qs: list[float],
    sub_bits: int = SUB_BITS,
    scale: int = SCALE,
) -> DataFrame:
    """Serve quantile estimates from a (possibly merged) partial table:
    one row per (group..., q) with the first bucket whose cumulative
    count reaches ceil(q * n); the estimate is that bucket's lower
    bound.  Work is keyed per group over O(buckets) rows."""
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = partials.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_tot)
    )
    qlit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    hit = (
        cum.select(*group_cols, "bucket", "cum", "n", qlit)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy(*group_cols, "q")
        .agg(F.min("bucket").alias("bucket"), F.max("n").alias("n"))
    )
    return hit.select(
        *group_cols,
        "q",
        "n",
        _bucket_low(F.col("bucket"), sub_bits, scale).alias("quantile_est"),
    )


def sql_hdr_quantiles(
    table: str,
    group_col: str,
    value_col: str,
    qs: list[float],
    sub_bits: int = SUB_BITS,
    scale: int = SCALE,
) -> str:
    """DuckDB twin of hdr_partial |> hdr_quantiles (single source)."""
    width = 1 << (sub_bits + 1)
    q_vals = ", ".join(f"({float(q)})" for q in qs)
    return f"""
WITH iv AS (
  SELECT {group_col} AS g,
         CAST(floor({value_col} * {scale}) AS BIGINT) AS iv
  FROM {table}
  WHERE {value_col} IS NOT NULL
),
pos AS (SELECT * FROM iv WHERE iv > 0),
bk AS (
  SELECT g,
         CAST(length(bin(iv)) AS BIGINT) * {width}
           + CAST(floor(iv / power(2.0, greatest(length(bin(iv)) - 1 - {sub_bits}, 0))) AS BIGINT)
           AS bucket
  FROM pos
),
part AS (SELECT g, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
cum AS (
  SELECT g, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM part
),
qs(q) AS (VALUES {q_vals}),
hit AS (
  SELECT g, q, MIN(bucket) AS bucket, MAX(n) AS n
  FROM cum CROSS JOIN qs
  WHERE cum >= ceil(q * n)
  GROUP BY 1, 2
)
SELECT g AS {group_col}, q, CAST(n AS BIGINT) AS n,
       ROUND(
         (bucket % {width})
           * power(2.0, greatest(CAST(floor(bucket / {width}) AS BIGINT) - 1 - {sub_bits}, 0))
           / {scale}, 6) AS quantile_est
FROM hit
"""


def hdr_range_bounds(
    partials: DataFrame,
    n_buckets: int,
    sub_bits: int = SUB_BITS,
    scale: int = SCALE,
) -> DataFrame:
    """Balanced range-partition bounds from the sketch: the (i/n)-quantile
    estimates for i = 1..n-1 — what `repartitionByRange` samples the data
    to discover, served instead from KB-sized mergeable partials.  The
    production use: pick range bounds for a sorted write / range join
    WITHOUT a sampling pass over 100 TB, with balance bounded by the
    sketch's relative error (2^-sub_bits per octave).

    `partials` must be ungrouped (built with group_cols=[]); the serve
    runs over O(buckets) rows, so its single-partition window is free.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return hdr_quantiles(partials, [], qs, sub_bits, scale).select(
        F.col("q"), F.col("quantile_est").alias("bound")
    )
