"""Determinism helpers for oracle-matched aggregation.

Floating-point sums are order-dependent; Spark's partial aggregation order
differs from DuckDB's sequential scan, so `SUM(double)` is NOT
reproducible bit-for-bit.  The fix used throughout the query layer: cast
each row's value to an exact DECIMAL first, sum the decimals (addition is
associative/commutative → order-independent), and cast the final result
back to DOUBLE.  Both engines then produce bit-identical doubles.

The same pattern appears in the oracle SQL strings — keep them in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
RATIO = "decimal(18,6)"
HI_PREC = "decimal(28,12)"


def dsum(col: Column | str, dec: str = MONEY) -> Column:
    """Order-independent SUM(double) via per-row decimal cast."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double")


def davg(col: Column | str, dec: str = MONEY) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double") / F.count(F.lit(1))


def sql_dsum(expr: str, dec: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE)"


def sql_davg(expr: str, dec: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE) / COUNT(*)"
