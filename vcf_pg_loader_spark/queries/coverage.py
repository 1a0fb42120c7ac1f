"""Oracle coverage for operators previously exercised only by pytest:
LD-block rollup, per-chromosome counts, insert-only merge.

Same pattern as queries/genomics.py: deterministic synthetic frames from
the fixtures feed the REAL engine operators, and a DuckDB twin validates
the operator's algebra end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcf_pg_loader_spark.queries.exports import (
    SQL_EXPORT_VARIANTS,
    export_variants,
)
from vcf_pg_loader_spark.sources.tables import load_table

_POPS = ["AFR", "AMR", "EAS", "EUR", "SAS"]


# ---------------------------------------------------------------------------
# LD-block rollup through the real operator (operators/matching.py
# ld_block_stats; reference references/ld_blocks.py:221-268)
# ---------------------------------------------------------------------------
def synth_ld_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    pops = F.array(*[F.lit(p) for p in _POPS])
    return s.select(
        F.element_at(pops, (k % 5 + 1).cast("int")).alias("population"),
        F.concat(F.lit("GRCh"), (37 + k % 2).cast("string")).alias(
            "genome_build"
        ),
        F.when(k % 3 == 0, "berisa_pickrell").otherwise("macld").alias("source"),
        (k * 1000).cast("bigint").alias("start_pos"),
        (k * 1000 + 500 + k % 100).cast("bigint").alias("end_pos"),
        (k % 50).cast("bigint").alias("n_snps"),
    )


SQL_LD_BLOCKS = """
  SELECT ['AFR','AMR','EAS','EUR','SAS'][CAST(s_suppkey % 5 AS INT) + 1]
           AS population,
         'GRCh' || CAST(37 + s_suppkey % 2 AS VARCHAR) AS genome_build,
         CASE WHEN s_suppkey % 3 = 0 THEN 'berisa_pickrell'
              ELSE 'macld' END AS source,
         CAST(s_suppkey * 1000 AS BIGINT) AS start_pos,
         CAST(s_suppkey * 1000 + 500 + s_suppkey % 100 AS BIGINT) AS end_pos,
         CAST(s_suppkey % 50 AS BIGINT) AS n_snps
  FROM supplier
"""


def q_gx_ld_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.matching import ld_block_stats

    return ld_block_stats(synth_ld_blocks(spark, sf_dir))


Q_GX_LD_BLOCK_STATS_SQL = f"""
SELECT population, genome_build, source,
       COUNT(*) AS block_count,
       MIN(start_pos) AS min_start,
       MAX(end_pos) AS max_end,
       AVG(n_snps) AS avg_snps
FROM ({SQL_LD_BLOCKS})
GROUP BY population, genome_build, source
"""


# ---------------------------------------------------------------------------
# per-chromosome counts through the real view op (plans/views.py
# chromosome_variant_counts; reference views/prs_views.py:117-126)
# ---------------------------------------------------------------------------
def q_chrom_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.plans.views import chromosome_variant_counts

    return chromosome_variant_counts(export_variants(spark, sf_dir))


Q_CHROM_COUNTS_SQL = f"""
SELECT chrom,
       COUNT(*) AS n_variants,
       COUNT(*) FILTER (WHERE in_hapmap3) AS n_hapmap3,
       COUNT(*) FILTER (WHERE in_hapmap3 AND info_score >= 0.6)
         AS n_prs_ready
FROM ({SQL_EXPORT_VARIANTS})
GROUP BY chrom
"""


# ---------------------------------------------------------------------------
# insert-only merge (ON CONFLICT DO NOTHING) through the real operator
# (operators/merge.py merge_insert_only; reference
# annotation_loader.py:166-170).  Incoming keys are unique per batch by
# construction — the operator's first-wins collapse of intra-batch dups
# is partition-order-dependent and not oracle-comparable.
# ---------------------------------------------------------------------------
def q_merge_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.merge import merge_insert_only

    cust = load_table(spark, sf_dir, "customer")
    existing = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("val"),
        F.lit("existing").alias("src"),
    )
    incoming = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("key"),
        F.upper(F.col("c_name")).alias("val"),
        F.lit("incoming").alias("src"),
    )
    return merge_insert_only(existing, incoming, ["key"])


Q_MERGE_INSERT_ONLY_SQL = """
WITH existing AS (
  SELECT c_custkey AS key, c_name AS val, 'existing' AS src
  FROM customer WHERE c_custkey % 3 <> 0
),
incoming AS (
  SELECT c_custkey AS key, upper(c_name) AS val, 'incoming' AS src
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT * FROM existing
UNION ALL
SELECT i.* FROM incoming i ANTI JOIN existing e USING (key)
"""


# ---------------------------------------------------------------------------
# incremental rollup maintenance (operators/rollup.py): the events table
# is split into two "arrival batches", each reduced to mergeable partial
# state, and the folded result must equal a from-scratch aggregate over
# everything — the continuous-aggregate correctness property, checked
# bit-exact against a single-pass DuckDB aggregate (decimal accumulators
# make the double sums order-independent; queries/_util.py).
# ---------------------------------------------------------------------------
def q_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.rollup import (
        event_rollup_partial,
        merge_rollup,
        rollup_final,
    )

    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 4 != 0)
    late = ev.filter(F.col("event_id") % 4 == 0)
    merged = merge_rollup(
        event_rollup_partial(first, "hour"),
        event_rollup_partial(late, "hour"),
    )
    return rollup_final(merged)


Q_ROLLUP_INCREMENTAL_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS total_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# counted rollup under retraction (operators/rollup.py *_counted): two
# insert batches, a delete wave, then a mixed batch re-inserting part of
# the deleted wave while deleting more — the continuous aggregate must
# equal a from-scratch COUNT/SUM over the retained events (MIN/MAX are
# excluded by design: not retraction-invertible).  Same Z-set batch
# algebra as the q_*_retract family; consolidation drops zero groups.
# ---------------------------------------------------------------------------
def q_rollup_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.ivm import MULT
    from vcf_pg_loader_spark.operators.rollup import (
        event_rollup_partial_counted,
        merge_rollup_counted,
        rollup_final_counted,
    )

    ev = load_table(spark, sf_dir, "events")
    e = F.col("event_id")

    def z(frame, mult):
        return frame.withColumn(MULT, F.lit(mult).cast("bigint"))

    batches = [
        z(ev.filter(e % 2 == 0), 1),
        z(ev.filter(e % 2 == 1), 1),
        z(ev.filter(e % 7 == 3), -1),
        # the additive fold makes retraction NON-idempotent (unlike the
        # keyed anti-joins of the retract sinks), so the second delete
        # wave must target only events still PRESENT — deleting an
        # already-deleted event would subtract twice
        z(ev.filter((e % 7 == 3) & (e % 3 == 0)), 1).unionByName(
            z(
                ev.filter(
                    (e % 11 == 5) & ((e % 7 != 3) | (e % 3 == 0))
                ),
                -1,
            )
        ),
    ]
    state = None
    for b in batches:
        part = event_rollup_partial_counted(b, "hour")
        state = (
            part.filter(F.col("n_events") != 0)
            if state is None
            else merge_rollup_counted(state, part)
        )
    return rollup_final_counted(state)


Q_ROLLUP_RETRACT_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS total_value
FROM events
WHERE (event_id % 11 <> 5) AND (event_id % 7 <> 3 OR event_id % 3 = 0)
GROUP BY 1, 2
"""


QUERIES = {
    "q_gx_ld_block_stats": q_gx_ld_block_stats,
    "q_chrom_counts": q_chrom_counts,
    "q_merge_insert_only": q_merge_insert_only,
    "q_rollup_incremental": q_rollup_incremental,
    "q_rollup_retract": q_rollup_retract,
}

ORACLE = {
    "q_gx_ld_block_stats": Q_GX_LD_BLOCK_STATS_SQL,
    "q_chrom_counts": Q_CHROM_COUNTS_SQL,
    "q_merge_insert_only": Q_MERGE_INSERT_ONLY_SQL,
    "q_rollup_incremental": Q_ROLLUP_INCREMENTAL_SQL,
    "q_rollup_retract": Q_ROLLUP_RETRACT_SQL,
}
