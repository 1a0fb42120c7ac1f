"""Variant-matching and flagging joins.

The reference builds Python dicts of the ENTIRE variants table in driver
memory and probes per record (utils/variant_matching.py:72-106 — its own
docstring concedes "For large databases, consider database-side
matching").  Here every lookup is a JOIN:

  - orientation handling  → match on a canonical unordered allele key
    (direct and strand-complement), then classify the orientation
  - rsid fallback         → a second left join + coalesce
  - HapMap3 flagging      → broadcast left join on (bare chrom, pos) with
    allele match incl. complements (references/hapmap3.py:53-107)
  - LD-block assignment   → broadcast interval theta-join
    (references/ld_blocks.py:151-219)

Broadcast is a hint: at 100 TB the variants side streams while the
reference panels (≤ a few M rows) broadcast; if a panel outgrows the
broadcast threshold AQE falls back to shuffle join automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.genomics import (
    alleles_match,
    complement,
    is_strand_ambiguous,
    strip_chr,
)


def allele_pair_key(a1: Column, a2: Column) -> Column:
    """Orientation-insensitive allele-pair key: sorted (upper) pair."""
    u1, u2 = F.upper(a1), F.upper(a2)
    return F.concat_ws("/", F.least(u1, u2), F.greatest(u1, u2))


def match_gwas_to_variants(
    stats: DataFrame,
    variants: DataFrame,
    broadcast_variants: bool = False,
) -> DataFrame:
    """Match GWAS records to variants on (chrom,pos) + allele orientation,
    with rsid fallback (utils/variant_matching.py:26-69 as joins).

    stats: read_gwas_ssf output; variants: frame with
    (variant_id, chrom, pos, ref, alt, rs_id).

    Returns stats + variant_id (+ harmonization columns).
    """
    v = variants.select(
        F.col("variant_id"),
        strip_chr(F.col("chrom")).alias("v_chrom"),
        F.col("pos").alias("v_pos"),
        F.upper("ref").alias("v_ref"),
        F.upper("alt").alias("v_alt"),
        F.col("rs_id").alias("v_rsid"),
    )
    if broadcast_variants:
        v = F.broadcast(v)

    s = stats.withColumn("s_chrom", strip_chr(F.col("chromosome")))

    # positional join + allele compatibility (all four orientations)
    by_pos = (
        s.join(
            v,
            (F.col("s_chrom") == F.col("v_chrom"))
            & (F.col("position") == F.col("v_pos"))
            & alleles_match(
                F.col("v_ref"), F.col("v_alt"),
                F.col("other_allele"), F.col("effect_allele"),
            ),
            "left",
        )
        .withColumnRenamed("variant_id", "pos_variant_id")
        .drop("v_chrom", "v_pos")
    )

    # rsid fallback for records that missed positionally
    rs = v.select(
        F.col("variant_id").alias("rs_variant_id"), F.col("v_rsid").alias("rs_key")
    ).filter(F.col("rs_key").isNotNull()).dropDuplicates(["rs_key"])
    out = by_pos.join(
        rs,
        by_pos["rsid"].isNotNull()
        & (by_pos["rsid"] == rs["rs_key"])
        & by_pos["pos_variant_id"].isNull(),
        "left",
    )

    ea, oa = F.upper("effect_allele"), F.upper("other_allele")
    vr, va = F.col("v_ref"), F.col("v_alt")
    direct = (ea == va) & (oa == vr) | (ea == vr) & (oa == va)
    flipped = (complement(ea) == va) & (complement(oa) == vr) | (
        complement(ea) == vr
    ) & (complement(oa) == va)
    is_effect_alt = F.when((ea == va) & (oa == vr), True).when(
        (ea == vr) & (oa == va), False
    ).when((complement(ea) == va) & (complement(oa) == vr), True).when(
        (complement(ea) == vr) & (complement(oa) == va), False
    )

    return out.select(
        *[stats[c] for c in stats.columns],
        F.coalesce(F.col("pos_variant_id"), F.col("rs_variant_id")).alias(
            "variant_id"
        ),
        F.when(F.col("pos_variant_id").isNotNull(), "position")
        .when(F.col("rs_variant_id").isNotNull(), "rsid")
        .alias("match_source"),
        F.when(direct, False).when(flipped, True).alias("is_strand_flipped"),
        is_effect_alt.alias("is_effect_allele_alt"),
        is_strand_ambiguous(ea, oa).alias("is_ambiguous"),
    )


def flag_hapmap3(variants: DataFrame, panel: DataFrame) -> DataFrame:
    """Set in_hapmap3/hapmap3_rsid via broadcast join
    (references/hapmap3.py:200-241, loader.py:627-670 as a join)."""
    p = F.broadcast(
        panel.select(
            F.col("chrom").alias("p_chrom"),
            F.col("position").alias("p_pos"),
            F.col("a1"),
            F.col("a2"),
            F.col("rsid").alias("p_rsid"),
        )
    )
    joined = variants.join(
        p,
        (strip_chr(F.col("chrom")) == F.col("p_chrom"))
        & (F.col("pos") == F.col("p_pos"))
        & alleles_match(F.col("ref"), F.col("alt"), F.col("a1"), F.col("a2")),
        "left",
    )
    out_cols = [variants[c] for c in variants.columns if c not in (
        "in_hapmap3", "hapmap3_rsid",
    )]
    return joined.select(
        *out_cols,
        F.col("p_rsid").isNotNull().alias("in_hapmap3"),
        F.col("p_rsid").alias("hapmap3_rsid"),
    )


def ld_block_stats(blocks: DataFrame, population: str | None = None) -> DataFrame:
    """Per-(population, build, source) LD-block rollup: count, span,
    average 1kG SNP density (reference references/ld_blocks.py:221-268).

    One hash aggregate over the (tiny) block table; the optional
    population filter prunes before the shuffle.
    """
    df = blocks
    if population:
        df = df.filter(F.col("population") == population.upper())
    return (
        df.groupBy("population", "genome_build", "source")
        .agg(
            F.count(F.lit(1)).alias("block_count"),
            F.min("start_pos").alias("min_start"),
            F.max("end_pos").alias("max_end"),
            F.avg("n_snps").alias("avg_snps"),
        )
        .orderBy("population", "genome_build")
    )


def assign_ld_blocks(variants: DataFrame, blocks: DataFrame) -> DataFrame:
    """Interval containment join: block whose [start,end] covers pos
    (references/ld_blocks.py:151-219 UPDATE → broadcast theta-join).
    Blocks are ~1.7k rows → broadcast nested loop is the right plan."""
    b = F.broadcast(
        blocks.select(
            F.col("chrom").alias("b_chrom"),
            "start_pos",
            "end_pos",
            F.monotonically_increasing_id().alias("ld_block_id"),
        )
    )
    joined = variants.join(
        b,
        (strip_chr(variants["chrom"]) == F.col("b_chrom"))
        & (variants["pos"] >= F.col("start_pos"))
        & (variants["pos"] <= F.col("end_pos")),
        "left",
    )
    return joined.select(
        *[variants[c] for c in variants.columns], F.col("ld_block_id")
    )
