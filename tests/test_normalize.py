"""vt normalization tests — vectors from the reference suite
(tests/unit/test_normalization.py) plus a property test pinning the
Catalyst closed form to the iterative Python twin."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.normalize import (
    classify_variant_expr,
    is_normalized_py,
    normalize_struct,
    normalize_variant_py,
)

VECTORS = [
    # (pos, ref, alt) -> (pos, ref, alt); reference test_normalization.py:17-24
    (10, "A", "G", 10, "A", "G"),
    (10, "GATC", "GTTC", 11, "A", "T"),
    (10, "ATCG", "TTCG", 10, "A", "T"),
    (10, "ACGT", "ACAT", 12, "G", "A"),
    (100, "A", "G", 100, "A", "G"),
    # indel trims (right-trim bounded without reference genome)
    (300, "ATT", "AT", 300, "AT", "A"),
    (400, "CGG", "CG", 400, "CG", "C"),
    # pos==1 boundary (reference test_normalization.py:141-173)
    (1, "A", "AG", 1, "A", "AG"),
    (1, "A", "G", 1, "A", "G"),
    (1, "AG", "A", 1, "AG", "A"),
    (1, "ATG", "ACG", 2, "T", "C"),
]


def _spark_norm(spark, pos, ref, alt):
    row = (
        spark.range(1)
        .select(
            normalize_struct(F.lit(pos).cast("bigint"), F.lit(ref), F.lit(alt)).alias(
                "n"
            )
        )
        .collect()[0]["n"]
    )
    return row["pos"], row["ref"], row["alt"]


@pytest.mark.parametrize("pos,ref,alt,epos,eref,ealt", VECTORS)
def test_vectors_python(pos, ref, alt, epos, eref, ealt):
    rpos, rref, ralts = normalize_variant_py(pos, ref, [alt])
    assert (rpos, rref, ralts[0]) == (epos, eref, ealt)


@pytest.mark.parametrize("pos,ref,alt,epos,eref,ealt", VECTORS)
def test_vectors_spark(spark, pos, ref, alt, epos, eref, ealt):
    assert _spark_norm(spark, pos, ref, alt) == (epos, eref, ealt)


ALLELE = st.text(alphabet="ACGT", min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(pos=st.integers(min_value=1, max_value=50), ref=ALLELE, alt=ALLELE)
def test_property_python_twin_matches_reference_loop(pos, ref, alt):
    """The closed form must equal the reference's iterative algorithm for
    every biallelic input (no reference genome)."""
    rpos, rref, ralts = normalize_variant_py(pos, ref, [alt])
    # closed-form recomputation (mirrors normalize_struct's math)
    r, a = ref.upper(), alt.upper()
    lcs = 0
    while lcs < min(len(r), len(a)) and r[-1 - lcs] == a[-1 - lcs]:
        lcs += 1
    bound = min(len(r), len(a)) - 1 if pos == 1 else min(len(r), len(a))
    rt = min(lcs, bound)
    r1, a1 = r[: len(r) - rt], a[: len(a) - rt]
    lcp = 0
    while lcp < min(len(r1), len(a1)) and r1[lcp] == a1[lcp]:
        lcp += 1
    lt = max(min(lcp, min(len(r1), len(a1)) - 1), 0)
    assert (rpos, rref, ralts[0]) == (pos + lt, r1[lt:], a1[lt:])


@settings(max_examples=60, deadline=None)
@given(ref=ALLELE, alts=st.lists(ALLELE, min_size=1, max_size=3))
def test_is_normalized_consistent(ref, alts):
    """A variant the quick-check calls normalized must be a fixed point of
    normalize (reference normalizer.py:131-157 contract)."""
    if is_normalized_py(ref, alts):
        pos2, ref2, alts2 = normalize_variant_py(10, ref, alts)
        assert (pos2, ref2, alts2) == (10, ref.upper(), [a.upper() for a in alts])


def test_spark_expression_matches_python_twin_batch(spark):
    """Random biallelic inputs through the Catalyst expression vs the
    iterative reference-twin, compared in one batch."""
    import random

    rng = random.Random(42)
    cases = [
        (
            rng.randint(1, 30),
            "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6))),
            "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6))),
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(cases, ["pos", "ref", "alt"]).select(
        "pos",
        "ref",
        "alt",
        normalize_struct(
            F.col("pos").cast("bigint"), F.col("ref"), F.col("alt")
        ).alias("n"),
    )
    for row in df.collect():
        epos, eref, ealts = normalize_variant_py(row.pos, row.ref, [row.alt])
        got = (row.n["pos"], row.n["ref"], row.n["alt"])
        assert got == (epos, eref, ealts[0]), (row.pos, row.ref, row.alt)


def test_classify(spark):
    df = spark.createDataFrame(
        [("A", "G"), ("A", "AT"), ("AT", "GC"), ("A", "<DEL>")], ["ref", "alt"]
    ).select(classify_variant_expr(F.col("ref"), F.col("alt")).alias("t"))
    assert [r.t for r in df.collect()] == ["snp", "indel", "mnp", "sv"]
