"""Write-time validation: the reference's CHECK constraints as filters +
violation metrics.

Postgres enforced these in DDL (schema.py:158-169 QC ranges,
genotypes/schema.py:37 dosage range); Parquet enforces nothing, so the
writer splits frames into (valid, violations) and records counts —
SURVEY §7.3 "generated/CHECK column semantics".

Each check declares the columns it needs; checks whose columns are
absent from the frame are skipped (pre-QC frames simply have fewer
gates), mirroring nullable CHECK semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Check = tuple[tuple[str, ...], Callable[[], Column]]


def _range(col: str, lo: float, hi: float) -> Column:
    c = F.col(col)
    return c.isNull() | ((c >= lo) & (c <= hi))


# variants CHECKs (reference schema.py:158-169)
VARIANT_CHECKS: dict[str, Check] = {
    "call_rate_range": (("call_rate",), lambda: _range("call_rate", 0.0, 1.0)),
    "aaf_range": (("aaf",), lambda: _range("aaf", 0.0, 1.0)),
    "maf_range": (("maf",), lambda: _range("maf", 0.0, 0.5)),
    "hwe_p_range": (("hwe_p",), lambda: _range("hwe_p", 0.0, 1.0)),
    "info_score_range": (("info_score",), lambda: _range("info_score", 0.0, 2.0)),
    "pos_positive": (("pos",), lambda: F.col("pos") > 0),
}

# genotype CHECKs (reference genotypes/schema.py:37)
GENOTYPE_CHECKS: dict[str, Check] = {
    "dosage_range": (("dosage",), lambda: _range("dosage", 0.0, 2.0)),
    "allele_balance_range": (
        ("allele_balance",),
        lambda: _range("allele_balance", 0.0, 1.0),
    ),
    "gq_nonneg": (("gq",), lambda: F.col("gq").isNull() | (F.col("gq") >= 0)),
    "dp_nonneg": (("dp",), lambda: F.col("dp").isNull() | (F.col("dp") >= 0)),
}


@dataclass
class ValidationReport:
    n_total: int
    n_valid: int
    violations: dict[str, int]

    @property
    def ok(self) -> bool:
        return self.n_valid == self.n_total


def validate(
    df: DataFrame, checks: dict[str, Check]
) -> tuple[DataFrame, ValidationReport]:
    """Split into (valid rows, report).  One aggregation pass counts all
    violations; the valid frame is the conjunction filter."""
    present = {
        name: build()
        for name, (cols, build) in checks.items()
        if all(c in df.columns for c in cols)
    }
    if not present:
        n = df.count()
        return df, ValidationReport(n, n, {})
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.count(F.when(~cond, 1)).alias(f"viol_{name}")
            for name, cond in present.items()
        ],
    ).collect()[0]
    violations = {
        name: agg[f"viol_{name}"] for name in present if agg[f"viol_{name}"] > 0
    }
    valid = df
    for cond in present.values():
        valid = valid.filter(cond)
    n_valid = agg["_n"] if not violations else valid.count()
    return valid, ValidationReport(agg["_n"], n_valid, violations)
