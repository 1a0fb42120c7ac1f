"""KMV distinct sketch: accuracy, exact-fallback, and merge semantics.

The oracle query (q_kmv_distinct) pins cross-engine bit-exactness; these
tests pin the properties that make it a sketch worth shipping: bounded
estimation error, exactness below k, and the union-merge law that lets
partial sketches fold across partitions/days like rollup partials.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from vcf_pg_loader_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 64


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


class TestKMV:
    def test_estimate_within_error_bound(self, spark, events):
        est = {
            r.event_type: r.n_distinct_est
            for r in kmv_estimate(
                kmv_sketch(events, ["event_type"], "user_id", K), K
            ).collect()
        }
        exact = {
            r.event_type: r.n
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for t, n in exact.items():
            # stderr ~ 1/sqrt(k-2) ≈ 13% at k=64; allow 4 sigma
            assert abs(est[t] - n) <= max(3, 0.52 * n), (t, est[t], n)

    def test_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [("g", f"v{i % 10}") for i in range(100)], "g string, v string"
        )
        est = kmv_estimate(kmv_sketch(df, ["g"], "v", K), K).first()
        assert est.n_distinct_est == 10.0  # < k distinct -> exact count

    def test_merge_equals_whole(self, spark, events):
        a = kmv_sketch(
            events.filter(F.col("event_id") % 2 == 0),
            ["event_type"], "user_id", K,
        )
        b = kmv_sketch(
            events.filter(F.col("event_id") % 2 == 1),
            ["event_type"], "user_id", K,
        )
        merged = {
            r.event_type: r.hashes
            for r in kmv_merge(a, b, ["event_type"], K).collect()
        }
        whole = {
            r.event_type: r.hashes
            for r in kmv_sketch(events, ["event_type"], "user_id", K).collect()
        }
        assert merged == whole  # sketch(a ∪ b) == merge(sketch(a), sketch(b))


class TestKMVEdges:
    def test_empty_input_yields_empty_sketch(self, spark):
        df = spark.createDataFrame([], "g string, v string")
        assert kmv_sketch(df, ["g"], "v", K).count() == 0

    def test_null_values_hash_distinctly_from_absent(self, spark):
        df = spark.createDataFrame(
            [("g", None), ("g", "a"), ("g", "a")], "g string, v string"
        )
        est = kmv_estimate(kmv_sketch(df, ["g"], "v", K), K).first()
        # CAST(NULL AS STRING) hashes to null -> dropped by h60's md5;
        # only 'a' counts (matching COUNT(DISTINCT v) null semantics)
        assert est.n_distinct_est == 1.0
