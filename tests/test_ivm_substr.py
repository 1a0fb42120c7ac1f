"""Incremental join-view maintenance (operators/ivm.py) and exact-
substring duplication spans (operators/dedup.py substring_dup_stats):
fold-order invariance, delta disjointness, and planted-duplicate
detection with the stride guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import dedup as D
from vcf_pg_loader_spark.operators.ivm import join_delta, maintain_join_view
from vcf_pg_loader_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "k")
    )


@pytest.fixture(scope="module")
def orders(spark):
    return (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "k")
    )


def _fold(li, orders, n_batches: int, order: list[int]):
    view = None
    l_old, r_old = li.limit(0), orders.limit(0)
    for i in order:
        dl = li.filter(F.col("k") % n_batches == i)
        dr = orders.filter(F.col("k") % n_batches == i)
        view = maintain_join_view(view, l_old, dl, r_old, dr, "k")
        l_old = l_old.unionByName(dl)
        r_old = r_old.unionByName(dr)
    return view


class TestIVM:
    def test_fold_equals_recompute(self, spark, li, orders):
        got = _fold(li, orders, 3, [0, 1, 2])
        want = li.join(orders, "k")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert want.count() > 0

    def test_fold_order_free(self, spark, li, orders):
        a = sorted(map(tuple, _fold(li, orders, 4, [0, 1, 2, 3]).collect()))
        b = sorted(map(tuple, _fold(li, orders, 4, [3, 1, 0, 2]).collect()))
        assert a == b

    def test_deltas_are_disjoint(self, spark, li, orders):
        """dL⋈R, L⋈dR, dL⋈dR never produce the same row twice: the three
        terms partition the new rows (L,R exclude the deltas), so the
        fold total equals the plain-join total with no dedup step."""
        mid_l = li.filter(F.col("k") % 2 == 0)
        mid_r = orders.filter(F.col("k") % 2 == 0)
        dl = li.filter(F.col("k") % 2 == 1)
        dr = orders.filter(F.col("k") % 2 == 1)
        delta = join_delta(mid_l, dl, mid_r, dr, "k")
        full = li.join(orders, "k")
        base = mid_l.join(mid_r, "k")
        assert delta.count() == full.count() - base.count()

    def test_uneven_arrival(self, spark, li, orders):
        """Left rows may arrive long before their right match (and vice
        versa) — the L⋈dR term picks them up on the later batch."""
        view = None
        l_old, r_old = li.limit(0), orders.limit(0)
        # all lineitems first, then all orders
        for dl, dr in ((li, orders.limit(0)), (li.limit(0), orders)):
            view = maintain_join_view(view, l_old, dl, r_old, dr, "k")
            l_old = l_old.unionByName(dl)
            r_old = r_old.unionByName(dr)
        assert view.count() == li.join(orders, "k").count()


class TestSubstringDedup:
    GRAM, STRIDE = 20, 4

    def _stats(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {
            r.doc_id: r
            for r in D.substring_dup_stats(
                df, gram_len=self.GRAM, stride=self.STRIDE
            ).collect()
        }

    def test_planted_cross_doc_duplicate(self, spark):
        shared = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, "unique opening text here " + shared),
            (2, shared + " entirely different tail content follows here"),
            (3, "this document shares nothing with any of the others at all"),
        ]
        got = self._stats(spark, rows)
        assert 1 in got and 2 in got
        assert 3 not in got  # no duplicated region -> absent entirely
        # the shared region is ~60 chars; spans must cover most of it
        assert got[1].dup_chars >= len(shared) - self.GRAM
        assert got[2].dup_chars >= len(shared) - self.GRAM

    def test_intra_doc_repetition_detected(self, spark):
        loop = "spam and eggs and spam " * 6
        got = self._stats(spark, [(1, loop), (2, "completely unrelated words")])
        assert 1 in got and got[1].dup_frac > 0.8
        assert 2 not in got

    def test_short_docs_yield_no_grams(self, spark):
        got = self._stats(spark, [(1, "tiny"), (2, "tiny")])
        assert got == {}  # shorter than gram_len: no positions at all

    def test_spans_merge_contiguously(self, spark):
        """One long shared region must merge into ONE span per doc, not a
        chain of per-gram islands."""
        shared = "x" * 5 + " shared shared shared shared shared shared " + "y" * 5
        rows = [(1, "aaa " + shared), (2, "bbb " + shared)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        spans = D.duplicated_substring_spans(
            df, gram_len=self.GRAM, stride=self.STRIDE
        )
        per_doc = {r[0]: r for r in spans.collect()}
        assert spans.count() == 2  # exactly one merged span per doc


class TestStripSpans:
    def test_exact_surgery(self, spark):
        docs = spark.createDataFrame(
            [(1, "abcdefghij"), (2, "0123456789")],
            "doc_id bigint, text string",
        )
        spans = spark.createDataFrame(
            [(1, 3, 6), (1, 8, 10)],  # cut cde (3..5) and hi (8..9)
            "doc_id bigint, span_start int, span_end int",
        )
        got = {
            r.doc_id: (r.clean_text, r.removed_chars)
            for r in D.strip_spans(docs, spans).collect()
        }
        assert got[1] == ("abfgj", 5)
        assert got[2] == ("0123456789", 0)  # no spans: untouched

    def test_span_overrunning_end_clamps(self, spark):
        docs = spark.createDataFrame([(1, "abcdef")], "doc_id bigint, text string")
        spans = spark.createDataFrame(
            [(1, 4, 99)], "doc_id bigint, span_start int, span_end int"
        )
        row = D.strip_spans(docs, spans).first()
        assert row.clean_text == "abc" and row.removed_chars == 3

    def test_round_trip_with_detected_spans(self, spark):
        """Cut the detected duplicated region: the two copies lose their
        shared text, and re-running detection on the cleaned corpus
        finds nothing."""
        shared = "shared boilerplate text repeated across documents " * 2
        docs = spark.createDataFrame(
            [(1, "intro one " + shared), (2, "different intro " + shared)],
            "doc_id bigint, text string",
        )
        spans = D.duplicated_substring_spans(docs, gram_len=20, stride=4)
        cleaned = D.strip_spans(docs, spans).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        again = D.duplicated_substring_spans(cleaned, gram_len=20, stride=4)
        assert again.count() == 0


class TestIVMAggComposition:
    def test_incremental_aggregate_over_join_view(self, spark, li, orders):
        """IVM composes with the rollup partials: maintain SUM(qty) per
        priority as join deltas arrive, folding each delta's partial
        aggregate into the maintained table — fold == one-shot, exactly
        (the continuous-aggregate-over-join shape)."""
        from vcf_pg_loader_spark.operators.ivm import join_delta

        def partial(df):
            return df.groupBy("o_orderpriority").agg(
                F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )

        def fold(a, b):
            return (
                a.unionByName(b)
                .groupBy("o_orderpriority")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            )

        view = None
        l_old, r_old = li.limit(0), orders.limit(0)
        for i in range(3):
            dl = li.filter(F.col("k") % 3 == i)
            dr = orders.filter(F.col("k") % 3 == i)
            delta = partial(join_delta(l_old, dl, r_old, dr, "k"))
            view = delta if view is None else fold(view, delta)
            l_old = l_old.unionByName(dl)
            r_old = r_old.unionByName(dr)
        got = {
            r.o_orderpriority: (str(r.s), r.n) for r in view.collect()
        }
        want = {
            r.o_orderpriority: (str(r.s), r.n)
            for r in partial(li.join(orders, "k")).collect()
        }
        assert got == want  # decimal accumulators: bit-exact fold


class TestCountedIVM:
    """Z-set maintenance (deletes as multiplicity -1): retractions are
    exact, including the cross terms deletes create."""

    def _z(self, spark, rows, mult=1):
        from vcf_pg_loader_spark.operators.ivm import as_zset

        return as_zset(
            spark.createDataFrame(rows, "k bigint, v string"), mult
        )

    def test_delete_retracts_exactly(self, spark):
        from vcf_pg_loader_spark.operators.ivm import (
            maintain_join_view_counted,
            zset_normalize,
        )

        l1 = self._z(spark, [(1, "a"), (1, "a"), (2, "b")])  # dup tuple!
        r1 = self._z(spark, [(1, "x"), (2, "y")]).withColumnRenamed("v", "w")
        view = maintain_join_view_counted(
            None, l1.limit(0), l1, r1.limit(0), r1, "k"
        )
        # (1,a,x) holds multiplicity 2
        m = {(r.k, r.v, r.w): r._mult for r in view.collect()}
        assert m == {(1, "a", "x"): 2, (2, "b", "y"): 1}

        # delete ONE of the two (1,a) copies
        dl = self._z(spark, [(1, "a")], mult=-1)
        l_old = zset_normalize(l1)
        view2 = maintain_join_view_counted(
            view, l_old, dl, r1, r1.limit(0), "k"
        )
        m2 = {(r.k, r.v, r.w): r._mult for r in view2.collect()}
        assert m2 == {(1, "a", "x"): 1, (2, "b", "y"): 1}

    def test_delete_both_sides_cross_term(self, spark):
        """Deleting matching tuples from BOTH sides in one batch: the
        delete x delete term has multiplicity (+1) and without it the
        view would over-retract."""
        from vcf_pg_loader_spark.operators.ivm import (
            maintain_join_view_counted,
            zset_normalize,
        )

        l1 = self._z(spark, [(1, "a"), (2, "b")])
        r1 = self._z(spark, [(1, "x"), (2, "y")]).withColumnRenamed("v", "w")
        view = maintain_join_view_counted(
            None, l1.limit(0), l1, r1.limit(0), r1, "k"
        )
        dl = self._z(spark, [(1, "a")], mult=-1)
        dr = self._z(spark, [(1, "x")], mult=-1).withColumnRenamed("v", "w")
        view2 = maintain_join_view_counted(view, l1, dl, r1, dr, "k")
        m = {(r.k, r.v, r.w): r._mult for r in view2.collect()}
        # (1,a,x) fully retracted: -1 (dLxR) -1 (LxdR) +1 (dLxdR) = net -1
        assert m == {(2, "b", "y"): 1}

    def test_delete_then_reinsert_identity(self, spark):
        from vcf_pg_loader_spark.operators.ivm import (
            maintain_join_view_counted,
            zset_normalize,
        )

        l1 = self._z(spark, [(1, "a"), (2, "b")])
        r1 = self._z(spark, [(1, "x"), (2, "y")]).withColumnRenamed("v", "w")
        view = maintain_join_view_counted(
            None, l1.limit(0), l1, r1.limit(0), r1, "k"
        )
        before = sorted(map(tuple, view.collect()))
        dl_del = self._z(spark, [(1, "a")], mult=-1)
        dl_ins = self._z(spark, [(1, "a")])
        v2 = maintain_join_view_counted(view, l1, dl_del, r1, r1.limit(0), "k")
        l_mid = zset_normalize(l1.unionByName(dl_del))
        v3 = maintain_join_view_counted(v2, l_mid, dl_ins, r1, r1.limit(0), "k")
        assert sorted(map(tuple, v3.collect())) == before
