"""Hardy-Weinberg equilibrium exact test (Wigginton et al. 2005).

Reference semantics: qc/variant_qc.py:110-238 (Python) and the plpgsql
twin validation/sql_functions.py:28-156.  The recursion over heterozygote
counts is inherently iterative, so this is the one genomics function that
needs a UDF — implemented as an Arrow-batched pandas UDF with a numpy
kernel per row (SURVEY §4 custom work #4).

`hwe_pvalue_py` is the exact scalar twin used as the test oracle.

NULL contract: the reference returns NaN for zero-call/impossible inputs
(variant_qc.py:127-128); through the Arrow boundary pandas NaN becomes
Spark NULL, so this engine surfaces those cases as NULL — the SQL-native
missing value, which composes correctly with filters and aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def hwe_pvalue_py(n_het: int, n_hom_ref: int, n_hom_alt: int) -> float:
    """Two-sided HWE exact p-value; NaN for no calls / impossible counts."""
    n = n_het + n_hom_ref + n_hom_alt
    if n == 0:
        return float("nan")
    n_a = 2 * n_hom_ref + n_het
    n_b = 2 * n_hom_alt + n_het
    if n_a == 0 or n_b == 0:
        return 1.0
    if n_het > min(n_a, n_b):
        return float("nan")

    probs = _het_probs(n, n_a, n_b)
    if probs is None or len(probs) == 0:
        return 1.0
    if n_het >= len(probs):
        return 1.0
    p_obs = probs[n_het]
    # Sequential (index-ordered) accumulation, NOT probs[mask].sum():
    # numpy's pairwise summation has an implementation-defined grouping
    # that a SQL left-fold cannot reproduce; a plain ordered loop is a
    # well-defined IEEE op sequence that the DuckDB oracle twin
    # (queries/genomics.py Q_GX_HWE_SQL) replicates bit-for-bit via
    # list_reduce.  Arrays are tiny (<= max_het+1) and memoized upstream.
    threshold = p_obs + 1e-10
    p_value = 0.0
    for v in probs:
        if v <= threshold:
            p_value += v
    return min(1.0, float(p_value))


def _het_probs(n: int, n_a: int, n_b: int) -> np.ndarray | None:
    """Probability of each heterozygote count under HWE (recursive)."""
    if n_a + n_b != 2 * n:
        return None
    min_het = abs(n_a - n_b) % 2
    max_het = min(n_a, n_b)
    if max_het < min_het:
        return None

    probs = np.zeros(max_het + 1)
    mid = (min_het + max_het) // 2
    if mid % 2 != min_het % 2:
        mid += 1 if mid < max_het else -1
    if mid > max_het or mid < min_het:
        mid = min_het

    probs[mid] = 1.0
    total = 1.0

    curr = mid
    while curr > min_het:
        prev = curr - 2
        if prev < 0:
            break
        n_aa = (n_a - curr) // 2
        n_bb = (n_b - curr) // 2
        if n_aa <= 0 or n_bb <= 0:
            break
        probs[prev] = probs[curr] * curr * (curr - 1) / (4.0 * n_aa * n_bb)
        total += probs[prev]
        curr = prev

    curr = mid
    while curr < max_het:
        nxt = curr + 2
        if nxt > max_het:
            break
        n_aa = (n_a - curr) // 2
        n_bb = (n_b - curr) // 2
        if n_aa < 0 or n_bb < 0:
            break
        probs[nxt] = probs[curr] * 4.0 * n_aa * n_bb / (nxt * (nxt - 1))
        total += probs[nxt]
        curr = nxt

    if total > 0:
        probs /= total
    return probs


# DataType instance (not a DDL string): keeps the decorator importable
# before any SparkSession exists.
@pandas_udf(DoubleType())
def hwe_exact_test(
    n_het: pd.Series, n_hom_ref: pd.Series, n_hom_alt: pd.Series
) -> pd.Series:
    """Vectorized (Arrow-batched) HWE exact test.

    Per-row recursion is unavoidable, but batching through Arrow removes
    the per-row Python round-trip; a memo on (het, hom_ref, hom_alt)
    triples collapses the common case where many variants share counts.
    """
    het = n_het.to_numpy()
    aa = n_hom_ref.to_numpy()
    bb = n_hom_alt.to_numpy()
    memo: dict[tuple[int, int, int], float] = {}
    out = np.empty(len(het))
    for i in range(len(het)):
        key = (int(het[i]), int(aa[i]), int(bb[i]))
        v = memo.get(key)
        if v is None:
            v = hwe_pvalue_py(*key)
            memo[key] = v
        out[i] = v
    return pd.Series(out)
