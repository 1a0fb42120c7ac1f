"""HDR histogram quantile sketch (operators/histogram.py): the merge
law (k-way, out-of-order partials fold to the identical sketch), the
relative-error bound vs exact percentiles, and domain handling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import histogram as H
from vcf_pg_loader_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
QS = [0.5, 0.9, 0.99]


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def _serve(partials):
    return {
        (r.event_type, r.q): (r.n, r.quantile_est)
        for r in H.hdr_quantiles(partials, ["event_type"], QS).collect()
    }


class TestMergeLaw:
    def test_merged_partials_equal_whole(self, spark, events):
        whole = H.hdr_partial(events, ["event_type"], "value")
        parts = [
            H.hdr_partial(
                events.filter(F.col("event_id") % 3 == i),
                ["event_type"],
                "value",
            )
            for i in range(3)
        ]
        merged = H.hdr_merge(
            H.hdr_merge(parts[2], parts[0], ["event_type"]),
            parts[1],
            ["event_type"],
        )
        a = sorted(map(tuple, whole.collect()))
        b = sorted(map(tuple, merged.collect()))
        assert a == b  # counts add exactly, any merge order
        assert _serve(whole) == _serve(merged)


class TestErrorBound:
    def test_relative_error_within_bucket_width(self, spark, events):
        """The estimate is the containing bucket's lower bound, so it
        under-reports by at most one bucket width: est <= exact and
        exact < est * (1 + 2^-sub_bits) + 1/scale."""
        exact = {
            (r.event_type, q): r[f"p{int(q * 100)}"]
            for r in events.groupBy("event_type")
            .agg(
                *[
                    F.expr(
                        f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)"
                    ).alias(f"p{int(q * 100)}")
                    for q in QS
                ]
            )
            .collect()
            for q in QS
        }
        est = _serve(H.hdr_partial(events, ["event_type"], "value"))
        assert set(est) == set(exact)
        rel = 2.0 ** -H.SUB_BITS
        for key, (_n, e) in est.items():
            x = exact[key]
            assert e <= x + 1e-9, (key, e, x)
            assert x <= e * (1 + rel) + 2.0 / H.SCALE + 1e-9, (key, e, x)

    def test_nulls_and_nonpositive_dropped(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", None), ("a", -5.0), ("a", 0.0), ("a", 2.0)],
            "g string, v double",
        )
        part = H.hdr_partial(df, ["g"], "v")
        assert part.agg(F.sum("cnt")).first()[0] == 2

    def test_deterministic_across_partitionings(self, spark, events):
        a = _serve(H.hdr_partial(events.repartition(32), ["event_type"], "value"))
        b = _serve(H.hdr_partial(events.coalesce(1), ["event_type"], "value"))
        assert a == b


class TestRangeBounds:
    def test_bounds_balance_partitions(self, spark, events):
        """Partitioning by the sketch-derived bounds yields ranges whose
        counts stay near ideal — the sampling-free repartitionByRange."""
        n = 8
        partials = H.hdr_partial(events, [], "value")
        bounds = sorted(
            r.bound for r in H.hdr_range_bounds(partials, n).collect()
        )
        assert len(bounds) == n - 1
        assert bounds == sorted(set(bounds))  # strictly increasing here
        expr = sum(
            (F.col("value") > F.lit(b)).cast("int") for b in bounds
        )
        counts = [
            r.c
            for r in events.filter(F.col("value").isNotNull())
            .select(expr.alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        total = sum(counts)
        ideal = total / n
        assert len(counts) == n
        assert max(counts) <= 2.0 * ideal  # log-bucket granularity bound

    def test_bounds_from_merged_partials_identical(self, spark, events):
        whole = H.hdr_partial(events, [], "value")
        parts = [
            H.hdr_partial(
                events.filter(F.col("event_id") % 2 == i), [], "value"
            )
            for i in range(2)
        ]
        merged = H.hdr_merge(parts[0], parts[1], [])
        a = sorted(r.bound for r in H.hdr_range_bounds(whole, 8).collect())
        b = sorted(r.bound for r in H.hdr_range_bounds(merged, 8).collect())
        assert a == b
