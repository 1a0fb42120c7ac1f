"""Salted aggregation/join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.skew import salted_agg_count, salted_join


def test_salted_count_equals_plain(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["key", "v"])
    plain = {r.key: r["count"] for r in df.groupBy("key").count().collect()}
    salted = {r.key: r["count"] for r in salted_agg_count(df, ["key"]).collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["key", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("missing", "M")], ["key", "tag"]
    )
    plain = big.join(small, ["key"]).orderBy("key", "v").collect()
    salted = salted_join(big, small, ["key"]).orderBy("key", "v").collect()
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]

    # left join keeps unmatched big rows
    left_plain = big.join(small, ["key"], "left").count()
    left_salted = salted_join(big, small, ["key"], how="left").count()
    assert left_salted == left_plain


def test_salted_join_rejects_small_side_preserving_how(spark):
    import pytest

    big = spark.createDataFrame([("a", 1)], ["key", "v"])
    small = spark.createDataFrame([("a", "A")], ["key", "tag"])
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(big, small, ["key"], how=how)
