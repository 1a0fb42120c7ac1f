"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (multi-way join + broadcast dims + exact
decimal aggregation) on sf0.001.
`queries()` / `oracle_sql()` — the declared operator inventory
(SURVEY.md §2) with DuckDB oracle twins; see vcf_pg_loader_spark.queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: regional supplier revenue (6-way join, broadcast dims)."""
    from vcf_pg_loader_spark.queries.core import q05_local_supplier

    return q05_local_supplier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from vcf_pg_loader_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from vcf_pg_loader_spark.queries import all_oracles

    return all_oracles()
