"""Product-analytics operators (queries/core.py): ordered funnel
conversion and retention cohorts — semantic invariants beyond the
value-exact oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestFunnel:
    def test_monotone_and_ordered(self, spark):
        from vcf_pg_loader_spark.queries.core import q_funnel_steps

        rows = sorted(
            q_funnel_steps(spark, SF_DIR).collect(), key=lambda r: r.step
        )
        assert [r.event_type for r in rows] == ["view", "click", "purchase"]
        # each step's population is a subset of the previous step's
        for a, b in zip(rows, rows[1:]):
            assert b.n_users <= a.n_users
        assert rows[0].conversion == 1.0
        assert all(0.0 <= r.conversion <= 1.0 for r in rows)

    def test_order_matters(self, spark):
        """A user whose only click PRECEDES every view must not count as
        converted — the funnel is ordered, not a mere co-occurrence."""
        from vcf_pg_loader_spark.queries.core import FUNNEL_STEPS

        assert FUNNEL_STEPS == ["view", "click", "purchase"]
        rows = [
            (1, "click", "2024-01-01 10:00:00"),
            (1, "view", "2024-01-01 11:00:00"),
            (2, "view", "2024-01-01 10:00:00"),
            (2, "click", "2024-01-01 11:00:00"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts_s string"
        ).select("user_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
        v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
            F.min("ts").alias("t_prev")
        )
        c = (
            ev.filter(F.col("event_type") == "click")
            .join(v, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_prev"))
        )
        assert {r.user_id for r in c.collect()} == {2}


class TestRetention:
    def test_offset_zero_covers_every_user_once(self, spark):
        from vcf_pg_loader_spark.queries.core import q_retention_cohorts
        from vcf_pg_loader_spark.sources.tables import load_table

        out = q_retention_cohorts(spark, SF_DIR)
        day0 = out.filter(F.col("day_offset") == 0)
        n_users = (
            load_table(spark, SF_DIR, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        # every user appears in exactly one cohort at offset 0
        assert day0.agg(F.sum("n_users")).first()[0] == n_users
        # later offsets never exceed their cohort's day-0 population
        j = out.alias("o").join(
            day0.select(
                F.col("cohort_day"), F.col("n_users").alias("n0")
            ).alias("z"),
            "cohort_day",
        )
        assert j.filter(F.col("o.n_users") > F.col("n0")).count() == 0
