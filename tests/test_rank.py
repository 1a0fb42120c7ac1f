"""Distributed global rank (operators/rank.py): identical output to the
single-partition window form, deterministic, and the DATA window is
keyed on the range-partition id — the corpus never sorts in one task.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vcf_pg_loader_spark.operators.rank import global_rank, length_batches


class TestGlobalRank:
    def test_equals_window_form(self, spark):
        df = spark.range(10_000).selectExpr(
            "id", "CAST(id * 37 % 9973 AS INT) AS v"
        )
        got = {
            (r.id, r.v): r["rank"]
            for r in global_rank(df, [("v", True), ("id", True)]).collect()
        }
        w = Window.orderBy(F.asc("v"), F.asc("id"))
        want = {
            (r.id, r.v): r["rank"]
            for r in df.withColumn("rank", F.row_number().over(w)).collect()
        }
        assert got == want

    def test_descending_and_determinism(self, spark):
        df = spark.range(3_000).selectExpr("id", "id % 7 AS v")
        a = sorted(
            map(tuple, global_rank(df, [("v", False), ("id", True)]).collect())
        )
        b = sorted(
            map(tuple, global_rank(df, [("v", False), ("id", True)]).collect())
        )
        assert a == b
        # rank 1 is the max-v, min-id row
        top = [t for t in a if t[-1] == 1]
        assert top == [(6, 6, 1)]

    def test_ranks_are_dense_across_range_boundaries(self, spark):
        # heavy ties: equal keys straddle range-partition boundaries;
        # the full order spec (key + tie-breaker) must keep ranks dense
        df = spark.range(5_000).selectExpr("id", "id % 3 AS v")
        ranks = sorted(
            r["rank"]
            for r in global_rank(
                df, [("v", True), ("id", True)], num_ranges=16
            ).collect()
        )
        assert ranks == list(range(1, 5_001))

    def test_data_window_is_keyed_not_global(self, spark):
        df = spark.range(10_000).selectExpr("id", "id % 97 AS v")
        plan = (
            global_rank(df, [("v", True), ("id", True)])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the row_number over the data is partitioned by _pid; the only
        # unpartitioned window runs over the partition-count offsets frame
        assert "row_number()" in plan
        assert "windowspecdefinition(_pid" in plan


class TestLengthBatches:
    def test_batches_are_rank_balanced_and_length_sorted(self, spark):
        rows = [(i, " ".join(["w"] * (1 + (i * 13) % 50))) for i in range(400)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = length_batches(docs, 8).collect()
        assert {r.batch_id for r in out} == set(range(1, 9))
        sizes = {r.batch_id: r.n_docs for r in out}
        assert all(v == 50 for v in sizes.values())  # 400 / 8 exactly
        # batch length ranges are non-overlapping and ascending
        by_id = sorted(out, key=lambda r: r.batch_id)
        for a, b in zip(by_id, by_id[1:]):
            assert a.max_tokens <= b.min_tokens
        assert sum(r.total_tokens for r in out) == sum(
            1 + (i * 13) % 50 for i in range(400)
        )
