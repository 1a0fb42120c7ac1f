"""Config-driven annotation tables: echtvar-compatible JSON field config
→ Spark schema → `anno_<source>` DataFrame from an annotation VCF.

Reference semantics: annotation_config.py:16-117 (field config + type
inference), annotation_schema.py:48-92 (generated DDL → here a generated
select list), annotation_loader.py:92-172 (per-ALT extraction + staged
dedup insert).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.merge import merge_insert_only

KEY = ["chrom", "pos", "ref", "alt"]


@dataclass(frozen=True)
class AnnotationFieldConfig:
    field: str
    alias: str
    field_type: str  # Integer | Float | String
    missing_value: int | None = None
    missing_string: str = "."
    multiplier: int = 1
    description: str = ""


def infer_field_type(item: dict) -> str:
    """Type inference from config hints (annotation_config.py:103-117)."""
    if "multiplier" in item and item.get("multiplier", 1) != 1:
        return "Float"
    if "missing_string" in item:
        return "String"
    name = item.get("field", "").upper()
    if name == "FILTER":
        return "String"
    if name in ("AF", "AF_POPMAX", "AF_CONTROLS_AND_BIOBANKS"):
        return "Float"
    return "Integer"


def load_field_config(path: str) -> list[AnnotationFieldConfig]:
    """echtvar-compatible JSON array → field configs
    (annotation_config.py:50-100)."""
    with open(path) as fh:
        raw = json.load(fh)
    if not isinstance(raw, list):
        raise ValueError("Configuration must be a JSON array")
    out = []
    for item in raw:
        if not isinstance(item, dict):
            raise ValueError("Each configuration item must be an object")
        if "field" not in item or "alias" not in item:
            raise ValueError("Each item must have 'field' and 'alias' keys")
        out.append(
            AnnotationFieldConfig(
                field=item["field"],
                alias=item["alias"],
                field_type=infer_field_type(item),
                missing_value=item.get("missing_value"),
                missing_string=item.get("missing_string", "."),
                multiplier=item.get("multiplier", 1),
                description=item.get("description", ""),
            )
        )
    return out


_SPARK_TYPES = {"Integer": "int", "Float": "double", "String": "string"}


def load_annotation_vcf(
    spark: SparkSession,
    vcf_path: str,
    config: list[AnnotationFieldConfig],
    human_genome: bool = True,
) -> DataFrame:
    """Annotation VCF → `anno_<source>` frame with configured columns.

    Rides the main expression-based VCF scan (per-ALT extraction
    included), then projects/casts the configured fields.  FILTER maps
    to the row's FILTER column; everything else reads from INFO.
    """
    from vcf_pg_loader_spark.sources.vcf import read_vcf

    base = read_vcf(spark, vcf_path, human_genome=human_genome)
    cols = [F.col(k) for k in KEY]
    for fc in config:
        if fc.field.upper() == "FILTER":
            src = F.when(
                F.size(F.col("filter")) == 0, F.lit(fc.missing_string)
            ).otherwise(F.concat_ws(";", F.col("filter")))
        else:
            src = F.col("info")[fc.field]
            if fc.field_type == "String":
                src = F.coalesce(src, F.lit(fc.missing_string))
        typ = _SPARK_TYPES[fc.field_type]
        if fc.field_type in ("Integer", "Float"):
            src = src.try_cast(typ)
            if fc.missing_value is not None:
                src = F.coalesce(src, F.lit(fc.missing_value).cast(typ))
        cols.append(src.alias(fc.alias))
    return base.select(*cols)


def upsert_annotations(
    existing: DataFrame, incoming: DataFrame
) -> DataFrame:
    """Staged dedup insert: COPY-to-temp + ON CONFLICT DO NOTHING
    (annotation_loader.py:146-172) → anti-join + union."""
    return merge_insert_only(existing, incoming, KEY)
