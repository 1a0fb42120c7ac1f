"""Bloom-filter semi-join pruning: build a compact bitmap over the small
side's join keys, broadcast it, and drop big-side rows that cannot match
BEFORE they reach the join's shuffle.

Why this exists at 100 TB: when the dimension side is selective but too
large (or too late-filtered) for a broadcast-hash join, the fact table
otherwise shuffles in full just to discard most rows at the probe.  A
Bloom bitmap of the dimension keys costs KBs to broadcast and removes
the non-matching fact rows at the SCAN side of the exchange — the
explicit form of the runtime-filter / semi-join-reduction optimization
(Spark's AQE InjectRuntimeFilter, Bloom joins in Trino/Snowflake).
False positives only let a few extra rows through to the real join,
which discards them — results are ALWAYS exact, so the whole plan is
oracle-checkable against the plain join.

Implementation is pure column expressions end to end:
  build: k xxhash64(key, seed) positions per key -> explode -> distinct
         -> per-word bit_or -> ONE row holding array<bigint> words
         (m/64 longs; m=2^16 bits ≈ 8 KB broadcast);
  probe: k getbit-style tests fused into whole-stage codegen —
         (words[p/64] >> (p%64)) & 1 for every seed, AND-ed.

No driver round-trip: the bitmap rides as a broadcast 1-row frame, so
the build is a tiny keyed aggregation and the probe a crossJoin(bcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """One-row frame: `words` = array<bigint> bitmap of the key set."""
    # round UP: a partial last word must still exist, or probe positions
    # in it would index past the array (element_at null -> silently
    # dropped matching rows)
    n_words = (m_bits + 63) // 64
    pos = _positions(F.col(key_col), m_bits, k_hashes)
    set_bits = (
        keys.select(F.explode(F.array(*pos)).alias("p"))
        .distinct()
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # shiftleft with a COLUMN bit count (the Python wrapper only
            # takes int literals; the SQL function takes both)
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                (F.col("p") % 64).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("mask"))
    )
    # densify into a fixed-length array so the probe is a plain index
    return set_bits.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("bigint")
            ),
        ).alias("words")
    )


def bloom_might_contain(
    key: Column, words: Column, m_bits: int = 1 << 16, k_hashes: int = 3
) -> Column:
    """True unless some hash position's bit is unset (definite miss)."""
    cond = F.lit(True)
    for p in _positions(key, m_bits, k_hashes):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        cond = cond & (F.getbit(word, (p % 64).cast("int")) == 1)
    return cond


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """big ⋈ small with the big side Bloom-pruned before the shuffle.
    Exact: false positives survive the prefilter but die in the join.

    Inner-only: for left/outer joins the prefilter would DROP definite-
    miss big-side rows that the join semantics require preserved with
    null right columns, so non-inner `how` raises instead of silently
    returning wrong results."""
    if how != "inner":
        raise ValueError(
            "bloom_prefilter_join is exact only for inner joins; "
            f"got how={how!r} (the prefilter drops big-side rows a "
            "left/outer join must keep)"
        )
    bloom = bloom_build(small.select(on).distinct(), on, m_bits, k_hashes)
    pruned = (
        big.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col(on), F.col("words"), m_bits, k_hashes))
        .drop("words")
    )
    return pruned.join(small, on, how)
