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


def interleave_bits_n(cols: list[Column], bits: int) -> Column:
    """Morton code of n non-negative ints in [0, 2^bits): bit i of
    column j lands at position i*n + (n-1-j), so earlier columns take
    the more significant position within each bit group.  n*bits must
    stay under 63 (signed bigint)."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} dims x {bits} bits overflows bigint")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * n + (n - 1 - j),
                )
            )
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def interleave_bits(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Morton code of two non-negative ints in [0, 2^bits): a's bit i
    lands at position 2i+1, b's at 2i."""
    return interleave_bits_n([a, b], bits)


def zorder_key(
    df: DataFrame, *cols: str, bits: int | None = None
) -> DataFrame:
    """Adds `_z`: the Morton code of n columns min/max-scaled to
    [0, 2^bits).  The min/max pass is ONE scalar aggregate broadcast
    back (never a window); constant columns collapse to 0 safely.
    Default bits split the 62-bit budget evenly (21 at n=2, 15 at n=4)."""
    n = len(cols)
    b = bits if bits is not None else min(_BITS, 62 // n)
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"_lo{i}"))
        aggs.append(F.max(c).alias(f"_hi{i}"))
    stats = df.agg(*aggs)
    top = float((1 << b) - 1)

    def scale(c, lo, hi):
        span = F.when(hi > lo, (hi - lo).cast("double")).otherwise(F.lit(1.0))
        return F.floor(
            (c.cast("double") - lo.cast("double")) / span * top
        ).cast("bigint")

    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = [
        scale(F.col(c), F.col(f"_lo{i}"), F.col(f"_hi{i}"))
        for i, c in enumerate(cols)
    ]
    drop = [f"_{p}{i}" for i in range(n) for p in ("lo", "hi")]
    return with_stats.withColumn("_z", interleave_bits_n(scaled, b)).drop(
        *drop
    )


def write_zordered(
    df: DataFrame,
    path: str,
    *cols: str,
    files: int = 32,
    bits: int | None = None,
) -> None:
    """Write `df` as parquet laid out along the Z-curve of `cols`:
    range-partitioned and sorted by the Morton code, so each output
    file covers a compact hyper-rectangle and min/max stats prune
    selective filters on ANY of the interleaved columns."""
    (
        zorder_key(df, *cols, bits=bits)
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
