"""vt-style variant normalization (Tan et al. 2015) as Catalyst expressions.

Reference semantics: normalizer.py:13-128 in the reference repo — two
phases, (1) right-trim-or-left-extend, (2) left-trim.  Without a reference
genome the left-extend path is a no-op (the reference `break`s), which
makes the whole algorithm closed-form:

  phase 1 (right trim): remove the longest common SUFFIX of (ref, alt),
    bounded so the loop's stop conditions hold:
      pos == 1 → stop before any allele drops below length 1
                 → trim ≤ min(len)-1
      pos  > 1 → the trim that empties an allele still happens, THEN the
                 loop breaks (no genome to extend with)
                 → trim ≤ min(len)  (== lcs, since lcs ≤ min(len))
  phase 2 (left trim): remove the longest common PREFIX bounded by
    min(len)-1 (stop when any allele reaches length 1), advancing pos.

Both common-affix lengths are computed with higher-order `aggregate` over
`sequence` — prefix equality is monotone, so "last i where the prefixes
match" is the longest common prefix.  Everything stays in whole-stage
codegen; no Python UDF in the scan path.

A pure-Python twin (`normalize_variant_py`) mirrors the reference
algorithm exactly and serves as the property-test oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _common_prefix_len(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings (JVM-side)."""
    bound = F.least(F.length(a), F.length(b))
    return F.aggregate(
        F.when(bound > 0, F.sequence(F.lit(1), bound)).otherwise(
            F.array().cast("array<int>")
        ),
        F.lit(0),
        lambda acc, i: F.when(
            a.substr(F.lit(1), i) == b.substr(F.lit(1), i), i
        ).otherwise(acc),
    )


def _common_suffix_len(a: Column, b: Column) -> Column:
    return _common_prefix_len(F.reverse(a), F.reverse(b))


def normalize_struct(pos: Column, ref: Column, alt: Column) -> Column:
    """Normalize a biallelic (pos, ref, alt) without a reference genome.

    Returns struct<pos bigint, ref string, alt string, was_normalized
    boolean>.  Matches normalize_variant(reference_genome=None) from the
    reference (normalizer.py:88-128) including its empty-allele edge case
    at pos>1.
    """
    r = F.upper(ref)
    a = F.upper(alt)
    minlen = F.least(F.length(r), F.length(a))

    lcs = _common_suffix_len(r, a)
    rt = F.when(pos == 1, F.least(lcs, minlen - 1)).otherwise(F.least(lcs, minlen))
    rt = F.greatest(rt, F.lit(0))
    r1 = r.substr(F.lit(1), F.length(r) - rt)
    a1 = a.substr(F.lit(1), F.length(a) - rt)

    minlen1 = F.least(F.length(r1), F.length(a1))
    lcp = _common_prefix_len(r1, a1)
    lt = F.greatest(F.least(lcp, minlen1 - 1), F.lit(0))
    r2 = r1.substr(lt + 1, F.length(r1))
    a2 = a1.substr(lt + 1, F.length(a1))
    new_pos = (pos + lt).cast("bigint")

    changed = (new_pos != pos) | (r2 != r) | (a2 != a)
    return F.struct(
        new_pos.alias("pos"),
        r2.alias("ref"),
        a2.alias("alt"),
        changed.alias("was_normalized"),
    )


def classify_variant_expr(ref: Column, alt: Column) -> Column:
    """snp / indel / mnp / sv classification (normalizer.py:160-180)."""
    return (
        F.when(alt.startswith("<") & alt.endswith(">"), F.lit("sv"))
        .when((F.length(ref) == 1) & (F.length(alt) == 1), F.lit("snp"))
        .when(F.length(ref) != F.length(alt), F.lit("indel"))
        .otherwise(F.lit("mnp"))
    )


# ---------------------------------------------------------------------------
# Python twin — the test oracle, mirroring the reference algorithm step by
# step (normalizer.py:13-128) rather than the closed form above.
# ---------------------------------------------------------------------------
def normalize_variant_py(
    pos: int, ref: str, alts: list[str], fetch_base=None
) -> tuple[int, str, list[str]]:
    """Iterative vt normalization; `fetch_base(pos)` supplies the left-
    extension base when a reference genome is available."""
    if not ref or not alts:
        return pos, ref, alts
    alleles = [ref.upper()] + [a.upper() for a in alts]

    if len(alleles) > 1:
        while True:
            to_right_trim = all(
                len(a) > 0 and a[-1] == alleles[0][-1] for a in alleles
            )
            to_left_extend = any(len(a) == 0 for a in alleles)
            if to_left_extend:
                to_right_trim = False
            if pos == 1 and any(len(a) == 1 for a in alleles):
                to_right_trim = False
            if not to_right_trim and not to_left_extend:
                break
            if to_right_trim:
                alleles = [a[:-1] for a in alleles]
            if to_left_extend:
                if fetch_base is None or pos <= 1:
                    break
                pos -= 1
                base = fetch_base(pos).upper()
                alleles = [base + a for a in alleles]

    while True:
        if any(len(a) <= 1 for a in alleles):
            break
        if len({a[0] for a in alleles}) != 1:
            break
        alleles = [a[1:] for a in alleles]
        pos += 1

    return pos, alleles[0], alleles[1:]


def is_normalized_py(ref: str, alts: list[str]) -> bool:
    """Necessary-and-sufficient normalization check (normalizer.py:131-157)."""
    if not ref or not alts:
        return True
    alleles = [ref.upper()] + [a.upper() for a in alts]
    if len({a[-1] for a in alleles if a}) == 1:
        return False
    if min(len(a) for a in alleles) == 1:
        return True
    return len({a[0] for a in alleles}) > 1
