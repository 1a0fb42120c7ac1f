"""Deterministic cross-engine hashing.

MinHash/SimHash/fingerprinting need hash functions that produce the SAME
values in Spark and in the DuckDB oracle.  Spark's `xxhash64`/`hash` and
DuckDB's `hash()` disagree, so we derive a 60-bit integer from the md5 hex
digest (md5 is identical everywhere): take the first 15 hex chars and
parse base-16.  60 bits keeps it inside a signed int64 on both engines.

Salting (`salt` prefix) yields the independent hash families MinHash
needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60(col: Column, salt: str = "") -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def sql_h60(expr: str, salt: str = "") -> str:
    """The DuckDB-SQL twin of :func:`h60`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"
