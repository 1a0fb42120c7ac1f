"""Query registry: name -> (spark_fn, oracle_sql).

This is the declared operator surface the driver's DuckDB oracle checks
(SURVEY.md §2).  Modules:
  core      — relational operators (scan/filter/join/agg/window/sort/setop)
  pipeline  — large-scale pipeline ops (dedup, similarity, text analysis)
  genomics  — genomics-domain operators expressed over the fixtures
  exports   — PRS exporter frames + candidate view through the real ops
  coverage  — LD-block stats, chrom counts, insert-only merge
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from vcf_pg_loader_spark.queries import core, coverage, exports, genomics, pipeline

    merged: dict[str, QueryFn] = {}
    for mod in (core, pipeline, genomics, exports, coverage):
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from vcf_pg_loader_spark.queries import core, coverage, exports, genomics, pipeline

    merged: dict[str, str] = {}
    for mod in (core, pipeline, genomics, exports, coverage):
        merged.update(mod.ORACLE)
    return merged
