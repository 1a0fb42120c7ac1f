"""Z-order (Morton-curve) file layout for multi-dimensional data skipping.

`sortWithinPartitions(pos)` gives one-dimensional row-group skipping;
queries filtering on TWO dimensions (pos AND qual, chrom-pos AND af,
lat AND lon) leave the second dimension unsorted and unprunable.  The
Z-order curve interleaves the bits of both dimensions into one sort
key, so rows close in (x, y) land close in the file order — parquet
min/max stats then prune on EITHER dimension (each file covers a small
rectangle of the 2-D space instead of a thin full-width stripe).  This
is what Delta/Iceberg `OPTIMIZE ZORDER BY` does; here it is a plain
column expression + range repartition, usable on any parquet write.

Scale shape: one scalar min/max aggregate (broadcast back — no global
window, no rank), then a narrow codegen expression per row, then the
same range-exchange any global sort pays.  The curve quality does not
depend on the data distribution beyond min/max clipping; heavily skewed
dimensions can pre-apply log/rank transforms upstream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 21 bits per dimension -> 42-bit code: fits a signed bigint with room,
# and 2^21 cells per axis is finer than any row-group granularity
_BITS = 21


def interleave_bits(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Morton code of two non-negative ints in [0, 2^bits): a's bit i
    lands at position 2i+1, b's at 2i."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = _BITS
) -> DataFrame:
    """Adds `_z`: the Morton code of the two columns min/max-scaled to
    [0, 2^bits).  The min/max pass is a scalar aggregate broadcast back
    (never a window); constant columns collapse to 0 safely."""
    stats = df.agg(
        F.min(col_a).alias("_amin"),
        F.max(col_a).alias("_amax"),
        F.min(col_b).alias("_bmin"),
        F.max(col_b).alias("_bmax"),
    )
    top = float((1 << bits) - 1)

    def scale(c, lo, hi):
        span = F.when(hi > lo, (hi - lo).cast("double")).otherwise(F.lit(1.0))
        return F.floor(
            (c.cast("double") - lo.cast("double")) / span * top
        ).cast("bigint")

    with_stats = df.crossJoin(F.broadcast(stats))
    a = scale(F.col(col_a), F.col("_amin"), F.col("_amax"))
    b = scale(F.col(col_b), F.col("_bmin"), F.col("_bmax"))
    return with_stats.withColumn("_z", interleave_bits(a, b, bits)).drop(
        "_amin", "_amax", "_bmin", "_bmax"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    files: int = 32,
    bits: int = _BITS,
) -> None:
    """Write `df` as parquet laid out along the Z-curve of (col_a,
    col_b): range-partitioned and sorted by the Morton code, so each
    output file covers a compact rectangle of the 2-D space and
    min/max stats prune on either column."""
    (
        zorder_key(df, col_a, col_b, bits)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
