"""Imputation-quality metric extraction per source.

Reference semantics: parsers/imputation.py — source detection from the
VCF header (minimac4 R2 / beagle DR2 / impute2 INFO) and per-variant
metric extraction with source-specific flag handling.

The detection runs on the driver (header text); the extraction is pure
column expressions over the INFO map — applied inside the scan, so at
100 TB it costs nothing beyond the expressions already being evaluated.
"""

from __future__ import annotations

import re
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ImputationSource(str, Enum):
    MINIMAC4 = "minimac4"
    BEAGLE = "beagle"
    IMPUTE2 = "impute2"
    AUTO = "auto"
    UNKNOWN = "unknown"


def detect_imputation_source(header_text: str) -> ImputationSource:
    """Header-based source detection (parsers/imputation.py:103-131)."""
    lower = header_text.lower()
    if "minimac" in lower:
        return ImputationSource.MINIMAC4
    if "beagle" in lower:
        return ImputationSource.BEAGLE
    if "impute2" in lower:
        return ImputationSource.IMPUTE2
    if re.search(r"##INFO=<ID=R2,", header_text):
        return ImputationSource.MINIMAC4
    if re.search(r"##INFO=<ID=DR2,", header_text):
        return ImputationSource.BEAGLE
    if re.search(r"##INFO=<ID=INFO,.*Type=Float", header_text):
        return ImputationSource.IMPUTE2
    return ImputationSource.UNKNOWN


def imputation_columns(
    info: Column, source: ImputationSource
) -> dict[str, Column]:
    """Column expressions for (info_score, imputation_r2, is_imputed,
    is_typed, imputation_source) given a detected source
    (parsers/imputation.py:172-225).

    NB: flags in the per-ALT info map are present-with-null-value, so
    flag truthiness = key presence.
    """
    null_f = F.lit(None).cast("float")
    if source == ImputationSource.MINIMAC4:
        r2 = info["R2"].try_cast("float")
        return {
            "info_score": r2,
            "imputation_r2": r2,
            "is_imputed": F.map_contains_key(info, "IMPUTED"),
            "is_typed": F.map_contains_key(info, "TYPED")
            | F.map_contains_key(info, "GENOTYPED"),
            "imputation_source": F.lit("minimac4"),
        }
    if source == ImputationSource.BEAGLE:
        dr2 = info["DR2"].try_cast("float")
        imputed = F.map_contains_key(info, "IMP")
        return {
            "info_score": dr2,
            "imputation_r2": dr2,
            "is_imputed": imputed,
            # DR2 == 1.0 without the IMP flag -> directly genotyped.
            # coalesce: missing DR2 makes the comparison NULL, but the
            # reference defaults is_typed to False (not missing), and
            # boolean filters must not silently drop those rows.
            "is_typed": F.coalesce((~imputed) & (dr2 >= 1.0), F.lit(False)),
            "imputation_source": F.lit("beagle"),
        }
    if source == ImputationSource.IMPUTE2:
        score = info["INFO"].try_cast("float")
        return {
            "info_score": score,
            "imputation_r2": score,
            "is_imputed": score.isNotNull(),
            "is_typed": F.lit(False),
            "imputation_source": F.lit("impute2"),
        }
    return {
        "info_score": null_f,
        "imputation_r2": null_f,
        "is_imputed": F.lit(False),
        "is_typed": F.lit(False),
        "imputation_source": F.lit(None).cast("string"),
    }


def with_imputation_metrics(
    df: DataFrame, source: ImputationSource, info_col: str = "info"
) -> DataFrame:
    """Attach/overwrite imputation metric columns on a variants frame."""
    cols = imputation_columns(F.col(info_col), source)
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df
