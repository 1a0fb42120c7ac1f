"""Edge-case coverage for dedup/similarity operators.

The oracle queries exercise these on the sf corpora, whose documents are
all long; these tests pin the short-input semantics under Spark 4 ANSI
mode (bare element_at throws there) and check the DuckDB twins agree.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.dedup import (
    minhash_lsh_dedup,
    shingles,
    simhash,
    sql_shingles,
)
from vcf_pg_loader_spark.operators.similarity import sign_bucket, sql_sign_bucket


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestShortDocShingles:
    ROWS = [
        (1, "only two"),
        (2, "a b c d"),
        (3, ""),
        (4, "one"),
        (5, "x y z"),
    ]

    def test_short_docs_yield_no_shingles(self, spark):
        out = shingles(_docs(spark, self.ROWS), "doc_id", "text", n=3)
        got = {(r.doc_id, r.shingle) for r in out.collect()}
        assert got == {(2, "a b c"), (2, "b c d"), (5, "x y z")}

    def test_matches_duckdb_twin(self, spark):
        out = shingles(_docs(spark, self.ROWS), "doc_id", "text", n=3)
        got = {(r.doc_id, r.shingle) for r in out.collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in self.ROWS)
            + ") AS v(doc_id, text)"
        )
        want = set(map(tuple, con.execute(sql_shingles(3)).fetchall()))
        assert got == want

    def test_lsh_pipeline_survives_short_docs(self, spark):
        # Regression: this crashed with INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
        out = minhash_lsh_dedup(
            _docs(spark, self.ROWS + [(6, "a b c d")]), threshold=0.5
        )
        pairs = {(r.d1, r.d2) for r in out.collect()}
        assert (2, 6) in pairs

    def test_simhash_tolerates_single_token(self, spark):
        out = simhash(_docs(spark, [(1, "one"), (2, "a b")]), "doc_id", "text")
        assert out.count() == 2


class TestShortVectorSignBucket:
    def test_missing_components_count_non_positive(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -2.0]), (2, [1.0, -2.0, 3.0, 4.0, -5.0, 6.0, 7.0, 8.0])],
            "vec_id bigint, embedding array<double>",
        )
        rows = {
            r.vec_id: r.bucket
            for r in df.select(
                "vec_id", sign_bucket(F.col("embedding"), bits=8).alias("bucket")
            ).collect()
        }
        assert rows[1] == 0b00000001
        assert rows[2] == 0b11101101

    def test_matches_duckdb_twin(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, -2.0]), (2, [0.5] * 3)],
            "vec_id bigint, embedding array<double>",
        )
        got = {
            r.vec_id: r.bucket
            for r in df.select(
                "vec_id", sign_bucket(F.col("embedding"), bits=8).alias("bucket")
            ).collect()
        }
        con = duckdb.connect()
        want = dict(
            con.execute(
                "SELECT vec_id, "
                + sql_sign_bucket("embedding", 8)
                + " FROM (VALUES (1, [1.0, -2.0]), (2, [0.5, 0.5, 0.5]))"
                " AS v(vec_id, embedding)"
            ).fetchall()
        )
        assert got == want


class TestPrefixFilteredJaccard:
    def test_equals_naive_self_join(self, spark):
        """Prefix filtering is a pruning, not an approximation: output
        must equal the naive all-pairs shingle self-join, including on a
        corpus with a hot shingle shared by every doc."""
        from vcf_pg_loader_spark.operators.dedup import (
            jaccard_pairs,
            prefix_filtered_jaccard_pairs,
        )

        hot = "the quick brown"
        rows = [
            (1, f"{hot} fox jumps over the lazy dog"),
            (2, f"{hot} fox jumps over the lazy cat"),
            (3, f"{hot} fox leaps over the lazy dog"),
            (4, f"{hot} entirely different tail of words here"),
            (5, "unrelated text with no overlap at all present"),
            (6, f"{hot} fox jumps over the lazy dog"),  # exact dup of 1
        ]
        sh = shingles(_docs(spark, rows), "doc_id", "text", n=3).persist()
        for t in (0.5, 0.8):
            naive = {tuple(r) for r in jaccard_pairs(sh, t).collect()}
            fast = {tuple(r) for r in prefix_filtered_jaccard_pairs(sh, t).collect()}
            assert fast == naive and (t > 0.5 or len(naive) > 0)
        sh.unpersist()
