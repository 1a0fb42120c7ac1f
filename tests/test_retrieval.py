"""Sparse retrieval (BM25 / TF-IDF), PMI collocations, and Bloom-pruned
joins: correctness against hand-computed values and plain-join ground
truth, plus the plan properties that carry the 100 TB story (no Python
in any plan, bloom bitmap broadcast, real pruning before the shuffle).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import retrieval as R
from vcf_pg_loader_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_join,
)
from vcf_pg_loader_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "spark shuffle join shuffle"),
        (2, "broadcast join"),
        (3, "spark spark spark"),
        (4, "window sort merge"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestBM25:
    def test_hand_computed_score(self, spark, tiny_docs):
        got = {
            r.doc_id: r.score
            for r in R.bm25_topk(tiny_docs, ["shuffle"], k=4).collect()
        }
        # only doc 1 contains "shuffle": tf=2, df=1, N=4, dl=4, avgdl=12/4
        n, df, tf, dl, avgdl, k1, b = 4, 1, 2, 4, 3.0, 1.2, 0.75
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        want = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert set(got) == {1}
        assert abs(got[1] - want) < 1e-6

    def test_multi_term_docs_outrank(self, spark, tiny_docs):
        rows = R.bm25_topk(tiny_docs, ["spark", "join"], k=4).collect()
        by_rank = [r.doc_id for r in sorted(rows, key=lambda r: r.rn)]
        # doc 1 matches BOTH terms and leads; 3 (spark×3) and 2 (join×1)
        # match one term each; 4 matches nothing and is absent entirely
        assert by_rank == [1, 3, 2]

    def test_no_python_in_plan(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        plan = R.bm25_topk(docs, ["vector", "merge"], 10)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "Arrow" not in plan
        # top-k is a TakeOrdered merge, not a global single-partition sort
        assert "TakeOrderedAndProject" in plan

    def test_scoring_only_touches_query_term_postings(self, spark, tiny_docs):
        # a term absent from every doc scores nothing and breaks nothing
        assert R.bm25_topk(tiny_docs, ["zzz_absent"], k=3).count() == 0


class TestTFIDF:
    def test_per_doc_rank_bounded_and_deterministic(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        out = R.tfidf_top_terms(docs, per_doc=3)
        counts = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
        assert counts <= 3
        a = sorted(map(tuple, out.collect()))
        b = sorted(map(tuple, R.tfidf_top_terms(docs, per_doc=3).collect()))
        assert a == b

    def test_rare_term_beats_common(self, spark, tiny_docs):
        out = {
            (r.doc_id, r.rn): r.term
            for r in R.tfidf_top_terms(tiny_docs, per_doc=1).collect()
        }
        # doc 1's top term is "shuffle" (tf=2, df=1), not "join" (df=2)
        assert out[(1, 1)] == "shuffle"


class TestBloom:
    def test_no_false_negatives(self, spark):
        keys = spark.range(0, 2000).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k")
        n_hit = (
            keys.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("k"), F.col("words")))
            .count()
        )
        assert n_hit == 2000  # a Bloom filter can NEVER miss a member

    def test_false_positive_rate_sane(self, spark):
        keys = spark.range(0, 2000).select(F.col("id").alias("k"))
        probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
        bloom = bloom_build(keys, "k")
        fp = (
            probe.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("k"), F.col("words")))
            .count()
        )
        # m=2^16, k=3, n=2000 -> theoretical fpr ~7e-4; allow 10x slack
        assert fp < 20000 * 0.01

    def test_join_results_exact(self, spark):
        li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        urgent = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey", "o_orderpriority")
        )
        got = sorted(
            map(tuple, bloom_prefilter_join(li, urgent, "o_orderkey").collect())
        )
        want = sorted(map(tuple, li.join(urgent, "o_orderkey").collect()))
        assert got == want and len(want) > 0

    def test_prefilter_actually_prunes(self, spark):
        li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        urgent = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        bloom = bloom_build(urgent.distinct(), "o_orderkey")
        kept = (
            li.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("o_orderkey"), F.col("words")))
            .count()
        )
        total = li.count()
        matched = li.join(urgent, "o_orderkey", "left_semi").count()
        # pruned to (matches + false positives), far below the full scan
        assert matched <= kept < total * 0.5

    def test_plan_broadcasts_bitmap_no_python(self, spark):
        li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        urgent = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        plan = bloom_prefilter_join(li, urgent, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap frame


class TestBloomEdges:
    def test_non_inner_how_raises(self, spark):
        """left/outer joins must raise: the prefilter drops definite-miss
        big-side rows that those join semantics require preserved."""
        li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        orders = load_table(spark, SF_DIR, "orders").select("o_orderkey")
        for how in ("left", "left_outer", "full", "right"):
            with pytest.raises(ValueError):
                bloom_prefilter_join(li, orders, "o_orderkey", how=how)

    def test_partial_last_word_m_bits_not_multiple_of_64(self, spark):
        """m_bits that doesn't divide by 64 must still be exact: hash
        positions in the partial last word need that word to EXIST
        (truncating n_words made element_at return null and silently
        dropped matching rows)."""
        keys = spark.range(0, 300).selectExpr("id as k")
        bloom = bloom_build(keys, "k", m_bits=100)
        n_hit = (
            keys.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col("k"), F.col("words"), m_bits=100))
            .count()
        )
        assert n_hit == 300  # never misses a member, even in word 1's tail


class TestBM25Index:
    def test_empty_text_doc_counts_toward_idf(self, spark, tmp_path):
        """A doc whose text tokenizes to zero terms still counts in
        n_docs: the served index must score identically to the fresh
        bm25_topk (and the shared oracle), which use COUNT(*) over the
        corpus."""
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index

        rows = [
            (1, "spark shuffle join shuffle"),
            (2, "broadcast join"),
            (3, ""),  # tokenizes to nothing — still a document
            (4, "   "),
            (5, "spark window"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        idx = BM25Index(spark, str(tmp_path / "bm25"))
        idx.build(docs)
        served = sorted(map(tuple, idx.search(["spark", "join"], k=5).collect()))
        fresh = sorted(
            map(tuple, R.bm25_topk(docs, ["spark", "join"], k=5).collect())
        )
        assert served == fresh and len(served) == 3


class TestDSIR:
    def test_target_domain_scores_higher(self, spark):
        """English is the target: en docs must carry higher importance
        weights than non-en docs on average, and by a clear margin —
        the resampling signal the method exists to produce."""
        from vcf_pg_loader_spark.queries.pipeline import q_dsir_weights
        from vcf_pg_loader_spark.sources.tables import load_table

        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
        w = q_dsir_weights(spark, SF_DIR).join(docs, "doc_id")
        rows = w.groupBy(F.col("lang") == "en").agg(
            F.avg("log_weight").alias("m")
        ).collect()
        means = {r[0]: r.m for r in rows}
        assert means[True] > means[False] + 1.0

    def test_weights_cover_every_doc(self, spark):
        from vcf_pg_loader_spark.queries.pipeline import q_dsir_weights
        from vcf_pg_loader_spark.sources.tables import load_table

        n_docs = load_table(spark, SF_DIR, "documents").count()
        assert q_dsir_weights(spark, SF_DIR).count() == n_docs
