"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit operators cover the cases AQE cannot: skewed
GROUP BY keys (one chromosome holding half the genome, one token in half
the documents) and broadcast-ineligible skewed joins on clusters where
runtime stats arrive too late.

  salted_count:  two-phase count — spread each hot key over S salts,
    partial-aggregate, then collapse.  The first shuffle carries S
    partitions per key instead of one.
  salted_join:   replicate the small side S× with salt ids, salt the big
    side randomly — every hot key's rows split across S reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg_count(
    df: DataFrame, key: list[str], salts: int = 16
) -> DataFrame:
    """COUNT(*) GROUP BY key, skew-resistant: pre-aggregate on
    (key, salt) then sum per key.  Deterministic results; the salt is
    derived from a hash of the full row so it needs no randomness."""
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts)),
    )
    partial = salted.groupBy(*key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*key).agg(F.sum("_c").alias("count"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated `salts`× so hot keys on
    the big side spread across reducers.

    big rows get a deterministic hash-derived salt; small rows are
    exploded over all salts.  Result equals big.join(small, key, how)
    for big-side-preserving joins ONLY — right/full outer would emit
    every unmatched small-side row once per salt replica, so those are
    rejected.
    """
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows in "
            "right/full outer results"
        )
    # Salt from a hash of the row PLUS a per-row id: hashing data columns
    # alone lumps low-cardinality payloads (a hot key whose payload takes
    # 50 distinct values lands on at most 50 salts, unevenly); mixing in
    # monotonically_increasing_id spreads a hot key's rows near-uniformly.
    # Join results are identical for ANY salt assignment — the small side
    # is replicated across all salts — so the salt only shapes task sizes.
    big_salted = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in big.columns],
                F.monotonically_increasing_id(),
            ),
            F.lit(salts),
        ),
    )
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = big_salted.join(small_replicated, [*key, "_salt"], how)
    return out.drop("_salt")
