"""Hypothesis property tests for the round-6 operators, checked against
plain-Python reference implementations: span surgery, HDR bucketing,
Bloom membership, and the CMS/HDR merge laws under arbitrary splits.

Spark calls are expensive per example, so each property draws ONE
composite batch of cases and runs them through a single DataFrame —
hypothesis explores the input space, Spark evaluates in bulk.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import dedup as D
from vcf_pg_loader_spark.operators import histogram as H

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _ref_strip(text: str, spans: list[tuple[int, int]]) -> str:
    """Reference span removal: 1-based half-open [s, e) char ranges."""
    keep = []
    prev = 1
    for s, e in sorted(spans):
        keep.append(text[prev - 1 : s - 1])
        prev = max(prev, e)
    keep.append(text[prev - 1 :])
    return "".join(keep)


@st.composite
def doc_with_spans(draw):
    text = draw(st.text(alphabet="abcdef ", min_size=1, max_size=60))
    n = len(text)
    n_spans = draw(st.integers(0, 3))
    spans, cursor = [], 1
    for _ in range(n_spans):
        if cursor > n:
            break
        s = draw(st.integers(cursor, n + 1))
        e = draw(st.integers(s + 1, n + 8))  # may overrun the end
        spans.append((s, e))
        cursor = e + 1  # keep spans disjoint and ordered
    return text, spans


class TestStripSpansProperty:
    @settings(**SETTINGS)
    @given(st.lists(doc_with_spans(), min_size=1, max_size=6))
    def test_matches_python_reference(self, spark, cases):
        docs = spark.createDataFrame(
            [(i, text) for i, (text, _) in enumerate(cases)],
            "doc_id bigint, text string",
        )
        span_rows = [
            (i, s, e)
            for i, (_, spans) in enumerate(cases)
            for s, e in spans
        ]
        spans_df = spark.createDataFrame(
            span_rows or [(-1, 1, 1)],
            "doc_id bigint, span_start int, span_end int",
        )
        got = {
            r.doc_id: r.clean_text
            for r in D.strip_spans(docs, spans_df).collect()
        }
        for i, (text, spans) in enumerate(cases):
            assert got[i] == _ref_strip(text, spans), (text, spans)


def _ref_bucket(iv: int, sub_bits: int) -> int:
    blen = iv.bit_length()
    shift = max(blen - 1 - sub_bits, 0)
    top = iv >> shift
    return blen * (1 << (sub_bits + 1)) + top


class TestHDRBucketProperty:
    @settings(**SETTINGS)
    @given(st.lists(st.integers(1, 2**50), min_size=1, max_size=40))
    def test_bucket_id_matches_bit_arithmetic(self, spark, ivs):
        df = spark.createDataFrame([(v,) for v in ivs], "iv bigint")
        got = [
            r.b
            for r in df.select(
                H._bucket_id(F.col("iv"), H.SUB_BITS).alias("b")
            ).collect()
        ]
        want = [_ref_bucket(v, H.SUB_BITS) for v in ivs]
        assert got == want

    @settings(**SETTINGS)
    @given(st.lists(st.integers(1, 2**40), min_size=2, max_size=40))
    def test_bucket_low_bounds_value(self, spark, ivs):
        """Every value falls in [low, low * (1 + 2^-sub)] of its bucket
        — the relative-error contract the quantile serve relies on."""
        df = spark.createDataFrame([(v,) for v in ivs], "iv bigint")
        rows = df.select(
            "iv",
            H._bucket_low(
                H._bucket_id(F.col("iv"), H.SUB_BITS), H.SUB_BITS, 1
            ).alias("low"),
        ).collect()
        for r in rows:
            assert r.low <= r.iv
            assert r.iv <= r.low * (1 + 2.0 ** -H.SUB_BITS) + 1


class TestBloomProperty:
    @settings(**SETTINGS)
    @given(
        st.lists(st.integers(0, 2**40), min_size=1, max_size=60, unique=True)
    )
    def test_no_false_negatives_ever(self, spark, keys):
        from vcf_pg_loader_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        df = spark.createDataFrame([(k,) for k in keys], "k bigint")
        bloom = bloom_build(df, "k")
        hits = (
            df.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("k"), F.col("words")))
            .count()
        )
        assert hits == len(keys)


class TestMergeLawsProperty:
    @settings(**SETTINGS)
    @given(st.lists(st.integers(0, 4), min_size=8, max_size=60))
    def test_hdr_any_split_folds_identically(self, spark, labels):
        """Partition rows into up to 5 arbitrary groups by the drawn
        labels; folding the per-group partials in any order equals the
        one-shot sketch."""
        rows = [(i, float(1 + (i * 37) % 500) / 7) for i in range(len(labels))]
        df = spark.createDataFrame(rows, "id bigint, v double")
        whole = sorted(map(tuple, H.hdr_partial(df, [], "v").collect()))
        parts = []
        for g in sorted(set(labels)):
            ids = [i for i, lab in enumerate(labels) if lab == g]
            parts.append(
                H.hdr_partial(df.filter(F.col("id").isin(ids)), [], "v")
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = H.hdr_merge(merged, p, [])
        assert sorted(map(tuple, merged.collect())) == whole


class TestGroupedTopK:
    def test_equals_window_form_and_shard_free(self, spark):
        from pyspark.sql.window import Window

        from vcf_pg_loader_spark.operators.topk import grouped_topk
        from vcf_pg_loader_spark.sources.tables import load_table

        ev = (
            load_table(spark, "/root/testdata/sf0.001", "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "value", "event_id")
        )
        w = Window.partitionBy("event_type").orderBy(
            F.desc("value"), F.asc("event_id")
        )
        want = sorted(
            map(
                tuple,
                ev.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 5)
                .collect(),
            )
        )
        for shards in (1, 4, 16):
            got = sorted(
                map(
                    tuple,
                    grouped_topk(
                        ev,
                        ["event_type"],
                        [("value", False), ("event_id", True)],
                        k=5,
                        shards=shards,
                    ).collect(),
                )
            )
            assert got == want, shards

    def test_hot_group_plan_is_k_bounded(self, spark):
        """One group holds 90% of 100k rows: the plan must carry the
        k-bounded accumulator — a Partial WindowGroupLimit on the MAP
        side of the exchange (each task ships <= k rows per group, so
        the hot group can never funnel its bulk through one task) and a
        Final one after — and the output must equal the Python truth.
        This is the round-6 verdict item: memory is bounded by k and
        the spillable sort, never by group or shard size."""
        from vcf_pg_loader_spark.operators.topk import grouped_topk

        df = spark.range(100_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE CAST(id % 10 AS INT) END AS g",
            "CAST(id * 37 % 99991 AS INT) AS v",
            "id",
        )
        out = grouped_topk(df, ["g"], [("v", False), ("id", True)], k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("WindowGroupLimit") == 2
        assert "Partial" in plan and "Final" in plan
        # tree prints root-first: the Partial (map-side) operator must
        # sit BELOW the exchange, i.e. later in the printed string
        assert plan.index(", Partial") > plan.index("Exchange")
        assert plan.index(", Final") < plan.index("Exchange")

        got = sorted(map(tuple, out.collect()))
        from collections import defaultdict

        by = defaultdict(list)
        for i in range(100_000):
            g = 0 if i % 10 < 9 else i % 10
            by[g].append((i * 37 % 99991, i))
        want = []
        for g, items in by.items():
            ranked = sorted(items, key=lambda t: (-t[0], t[1]))[:3]
            want += [(g, v, i, rn) for rn, (v, i) in enumerate(ranked, 1)]
        assert got == sorted(want)

    @settings(**SETTINGS)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(-50, 50)),
            min_size=1,
            max_size=60,
        )
    )
    def test_property_vs_python(self, spark, rows):
        from vcf_pg_loader_spark.operators.topk import grouped_topk

        df = spark.createDataFrame(
            [(g, v, i) for i, (g, v) in enumerate(rows)],
            "g int, v int, id int",
        )
        got = {
            (r.g, r.rn): (r.v, r.id)
            for r in grouped_topk(
                df, ["g"], [("v", True), ("id", True)], k=2, shards=3
            ).collect()
        }
        by_g: dict[int, list] = {}
        for i, (g, v) in enumerate(rows):
            by_g.setdefault(g, []).append((v, i))
        for g, items in by_g.items():
            for rank, (v, i) in enumerate(sorted(items)[:2], start=1):
                assert got[(g, rank)] == (v, i)
