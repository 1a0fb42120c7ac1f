"""Multi-source variant annotation: dynamic LEFT-join chain + echtvar
filter + limit.

Reference semantics: annotator.py:28-247 (dynamic SELECT over N
`anno_<source>` tables joined on (chrom,pos,ref,alt)), registry
annotation_schema.py:29-46, field discovery :255-278.

Spark shape: each annotation source is a DataFrame registered in an
in-session registry; annotate() chains broadcast LEFT joins (annotation
tables are the small side) and pushes the translated filter into the
plan so Catalyst prunes both the scan and the joins.  The reference's
regex-based field qualification (annotator.py:249-270) is unnecessary —
column resolution is Catalyst's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.plans import expression

JOIN_KEY = ["chrom", "pos", "ref", "alt"]


class AnnotationRegistry:
    """In-session analogue of the `annotation_sources` table."""

    def __init__(self) -> None:
        self._sources: dict[str, DataFrame] = {}

    def register(self, name: str, df: DataFrame) -> None:
        missing = [k for k in JOIN_KEY if k not in df.columns]
        if missing:
            raise ValueError(f"annotation source '{name}' missing keys: {missing}")
        self._sources[name] = df
        df.createOrReplaceTempView(f"anno_{name}")

    def sources(self) -> list[str]:
        return sorted(self._sources)

    def fields(self, name: str) -> list[str]:
        return [c for c in self._sources[name].columns if c not in JOIN_KEY]

    def available_fields(self) -> set[str]:
        """All queryable fields across sources (annotator.py:99-115)."""
        out: set[str] = set()
        for name in self._sources:
            out.update(self.fields(name))
        return out

    def get(self, name: str) -> DataFrame:
        return self._sources[name]


def annotate(
    variants: DataFrame,
    registry: AnnotationRegistry,
    sources: list[str] | None = None,
    filter_expr: str | None = None,
    limit: int | None = None,
    broadcast_sources: bool = True,
) -> DataFrame:
    """LEFT-join each annotation source on (chrom,pos,ref,alt), apply the
    echtvar filter, optional LIMIT (annotator.py:117-181)."""
    out = variants
    for name in sources or registry.sources():
        src = registry.get(name)
        # prefix non-key columns only on collision, like the reference's
        # per-source aliases
        for col in registry.fields(name):
            if col in out.columns:
                src = src.withColumnRenamed(col, f"{name}_{col}")
        if broadcast_sources:
            src = F.broadcast(src)
        out = out.join(src, JOIN_KEY, "left")
    if filter_expr:
        out = out.filter(
            F.expr(expression.to_sql(filter_expr, set(out.columns)))
        )
    if limit is not None:
        out = out.limit(limit)
    return out
