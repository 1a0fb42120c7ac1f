"""Deterministic sampling and dataset splitting for training-data mixes.

A training pipeline needs reproducible answers to "which docs are in the
train split?" and "sample source X at 30%, source Y at 5%" — answers that
must not change when the corpus is re-partitioned, re-ordered, or re-run
(Spark's `df.sample` is seed-stable only for a fixed partitioning, so it
is NOT reproducible across layouts).  Everything here keys off a
deterministic 60-bit md5 hash of the row id (functions/hashing.h60), so
membership is a pure function of the row — stable across engines,
cluster sizes, and runs, and reproducible by the DuckDB oracle.

All operators are narrow column expressions (no shuffle, no UDF): at
100 TB they ride the scan inside whole-stage codegen, and split/sample
predicates sit right above the parquet reader where Catalyst can fuse
them with other filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.hashing import h60, sql_h60

# hash-bucket resolution: rates are quantized to 1/10000
BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str = "split:") -> Column:
    """Stable bucket in [0, BUCKETS) from the row id."""
    return F.pmod(h60(id_col.cast("string"), salt), F.lit(BUCKETS))


def sql_hash_bucket(expr: str, salt: str = "split:") -> str:
    h = sql_h60(f"CAST({expr} AS VARCHAR)", salt)
    return f"(({h} % {BUCKETS}) + {BUCKETS}) % {BUCKETS}"


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split:",
) -> DataFrame:
    """Add a `split` column partitioning rows by cumulative hash ranges.

    Weights need not sum to 1; they are normalized.  A row's split is a
    pure function of (id, salt): adding or removing other rows never
    moves it — the property that keeps eval sets uncontaminated when the
    corpus grows.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = hash_bucket(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(round(acc * BUCKETS))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return df.withColumn(
        "split", F.lit(last) if expr is None else expr.otherwise(last)
    )


def sql_assign_split(
    expr: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split:",
) -> str:
    """DuckDB CASE expression twin of :func:`assign_split`."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    bucket = sql_hash_bucket(expr, salt)
    items = list(weights.items())
    acc = 0.0
    arms = []
    for name, w in items[:-1]:
        acc += w / total
        cut = int(round(acc * BUCKETS))
        arms.append(f"WHEN {bucket} < {cut} THEN '{name}'")
    if not arms:
        return f"'{items[-1][0]}'"
    return "CASE " + " ".join(arms) + f" ELSE '{items[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample:",
) -> DataFrame:
    """Keep each stratum at its own rate (quantized to 1/BUCKETS),
    deterministically by row id — the data-mixing primitive: "books at
    3 epochs worth, web at 0.3" resolves to per-source keep rates.

    One narrow filter; strata with no configured rate keep
    `default_rate`.  Reproducible: re-running over a re-partitioned or
    re-ordered corpus selects the SAME rows.
    """
    bucket = hash_bucket(F.col(id_col), salt)
    rate: Column = F.lit(int(round(default_rate * BUCKETS)))
    for name, r in rates.items():
        rate = (
            F.when(F.col(stratum_col) == name, F.lit(int(round(r * BUCKETS))))
            .otherwise(rate)
        )
    return df.filter(bucket < rate)


def sql_stratified_sample_pred(
    rates: dict[str, float],
    stratum_col: str = "source",
    expr: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample:",
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample`."""
    bucket = sql_hash_bucket(expr, salt)
    arms = " ".join(
        f"WHEN {stratum_col} = '{n}' THEN {int(round(r * BUCKETS))}"
        for n, r in rates.items()
    )
    rate = f"CASE {arms} ELSE {int(round(default_rate * BUCKETS))} END"
    return f"{bucket} < {rate}"


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    n: int,
    salt: str = "ws:",
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of n rows, where a
    row's inclusion probability is proportional to its weight —
    Efraimidis–Spirakis A-Res: rank every row by u^(1/w) with u a
    uniform derived from the deterministic row hash, keep the top n.

    Deterministic like everything in this module (same corpus + salt →
    same sample, any partitioning), which makes weighted data mixes
    reproducible across reruns.  Plan shape: a narrow key expression,
    then TakeOrdered(n) — per-partition top-n merged on the driver-side
    reducer, never a global sort.  Cross-engine oracle parity is NOT
    claimed here: pow() may differ in the last ulp between engines, so
    the selection boundary could flip; within Spark it is exact.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (h60(F.col(id_col).cast("string"), salt) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(1 << 60))
    key = F.pow(u, F.lit(1.0) / w.cast("double"))
    return (
        df.withColumn("_ws_key", key)
        .orderBy(F.desc("_ws_key"), F.asc(id_col))
        .limit(n)
        .drop("_ws_key")
    )
