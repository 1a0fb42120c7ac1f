"""Genomics scalar functions as pure Spark column expressions.

These mirror the reference's registered SQL functions
(validation/sql_functions.py:20-26) and harmonization helpers
(gwas/loader.py:68-176) — all expressible without UDFs, so they run in
whole-stage codegen.  `register_sql_functions` exposes them to
`spark.sql` for SQL-level parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# chromosome enum order (reference schema.py:15-41): chr1..chr22, X, Y, M
CHROM_ORDER = [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY", "chrM"]


def complement(allele: Column) -> Column:
    """Strand complement via TRANSLATE (sql_functions.py:213-214)."""
    return F.translate(F.upper(allele), "ACGT", "TGCA")


def strip_chr(chrom: Column) -> Column:
    """Bare chromosome name (utils/variant_matching.py:6-14)."""
    return F.regexp_replace(chrom, "^chr", "")


def add_chr(chrom: Column) -> Column:
    """Canonical human chromosome name (vcf_parser.py:303-306)."""
    return F.concat(F.lit("chr"), strip_chr(chrom))


def chrom_sort_key(chrom: Column) -> Column:
    """Integer sort key honoring the chromosome enum order so
    `ORDER BY chrom, pos` exports are stable (SURVEY §4 custom work #3)."""
    mapping = F.create_map(
        *[F.lit(x) for pair in ((c, i) for i, c in enumerate(CHROM_ORDER)) for x in pair]
    )
    return F.coalesce(mapping[add_chr(chrom)], F.lit(99))


def is_strand_ambiguous(a1: Column, a2: Column) -> Column:
    """A/T or C/G pair check (gwas/loader.py:68-71)."""
    u1, u2 = F.upper(a1), F.upper(a2)
    return ((u1 == "A") & (u2 == "T")) | ((u1 == "T") & (u2 == "A")) | (
        (u1 == "C") & (u2 == "G")
    ) | ((u1 == "G") & (u2 == "C"))


def alleles_match(ref1: Column, alt1: Column, ref2: Column, alt2: Column) -> Column:
    """Exact / swap / strand-flip / flip-swap allele match
    (sql_functions.py:182-227).  NULL in → NULL out (STRICT semantics)."""
    r1, a1 = F.upper(ref1), F.upper(alt1)
    r2, a2 = F.upper(ref2), F.upper(alt2)
    r1c, a1c = complement(r1), complement(a1)
    matched = (
        ((r1 == r2) & (a1 == a2))
        | ((r1 == a2) & (a1 == r2))
        | ((r1c == r2) & (a1c == a2))
        | ((r1c == a2) & (a1c == r2))
    )
    any_null = ref1.isNull() | alt1.isNull() | ref2.isNull() | alt2.isNull()
    return F.when(any_null, F.lit(None).cast("boolean")).otherwise(matched)


def n_eff(n_cases: Column, n_controls: Column) -> Column:
    """Effective sample size 4·cases·controls/(cases+controls)
    (sql_functions.py:169-179); NULL when either side is 0."""
    return F.when(
        (n_cases == 0) | (n_controls == 0), F.lit(None).cast("double")
    ).otherwise(
        4.0 * n_cases.cast("double") * n_controls.cast("double")
        / (n_cases + n_controls).cast("double")
    )


def af_from_dosages(dosages: Column) -> Column:
    """AVG(d)/2 over non-null array entries (sql_functions.py:159-166) —
    higher-order aggregate, no explode, no UDF."""
    valid = F.filter(dosages, lambda d: d.isNotNull())
    n = F.size(valid)
    total = F.aggregate(
        valid, F.lit(0.0), lambda acc, d: acc + d.cast("double")
    )
    return F.when(n > 0, total / (2.0 * n)).otherwise(F.lit(None).cast("double"))


def gt_to_dosage(gt: Column) -> Column:
    """CASE GT→dosage: 0/0→0, 0/1|1/0→1, 1/1→2 (docs/prs-workflows.md:328-334)."""
    g = F.translate(gt, "|", "/")
    return (
        F.when(g == "0/0", 0.0)
        .when((g == "0/1") | (g == "1/0"), 1.0)
        .when(g == "1/1", 2.0)
        .otherwise(F.lit(None).cast("double"))
    )


def dosage_from_gp(gp: Column) -> Column:
    """Dosage from genotype probabilities: GP[1] + 2·GP[2]
    (genotypes/genotype_loader.py:121-137)."""
    return F.when(
        F.size(gp) >= 3,
        F.element_at(gp, 2).cast("double") + 2.0 * F.element_at(gp, 3).cast("double"),
    ).otherwise(F.lit(None).cast("double"))


def allele_balance(ad: Column) -> Column:
    """Het allele balance: sum(AD[1:]) / sum(AD)
    (genotypes/genotype_loader.py:99-118)."""
    total = F.aggregate(
        ad,
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + F.coalesce(v.cast("bigint"), F.lit(0).cast("bigint")),
    )
    alt_sum = total - F.coalesce(F.element_at(ad, 1).cast("bigint"), F.lit(0))
    return F.when(total > 0, alt_sum.cast("double") / total.cast("double")).otherwise(
        F.lit(None).cast("double")
    )


def passes_adj(gt: Column, gq: Column, dp: Column, ad: Column) -> Column:
    """gnomAD ADJ genotype filter: GQ>=20, DP>=10, het AB>=0.2 — missing
    values pass (genotypes/genotype_loader.py:140-172; generated column
    genotypes/schema.py:31-35)."""
    g = F.translate(gt, "|", "/")
    is_het = (g == "0/1") | (g == "1/0") | (g == "1/2") | (g == "2/1")
    ab = allele_balance(ad)
    return (
        (gq.isNull() | (gq >= 20))
        & (dp.isNull() | (dp >= 10))
        & (~is_het | ab.isNull() | (ab >= 0.2))
    )


def is_transition(ref: Column, alt: Column) -> Column:
    """Transition (A<->G, C<->T) vs transversion (qc/sample_qc.py:80-117)."""
    pair = F.concat(F.upper(ref), F.upper(alt))
    return pair.isin("AG", "GA", "CT", "TC")


def worst_impact(impacts: Column) -> Column:
    """Pick highest-severity impact from an array: HIGH > MODERATE > LOW >
    MODIFIER (type_mapping.py:141-161)."""
    rank = F.array(F.lit("HIGH"), F.lit("MODERATE"), F.lit("LOW"), F.lit("MODIFIER"))
    return F.aggregate(
        impacts,
        F.lit(None).cast("string"),
        lambda best, x: F.when(
            best.isNull()
            | (
                F.coalesce(F.array_position(rank, x), F.lit(99))
                < F.coalesce(F.array_position(rank, best), F.lit(99))
            ),
            x,
        ).otherwise(best),
    )


# Reference type_mapping.py:90-103 — raw CLNSIG token -> normalized label.
CLINVAR_SIGNIFICANCE_MAP: dict[str, str] = {
    "Benign": "benign",
    "Likely_benign": "likely_benign",
    "Uncertain_significance": "vus",
    "Likely_pathogenic": "likely_pathogenic",
    "Pathogenic": "pathogenic",
    "Conflicting_interpretations_of_pathogenicity": "conflicting",
    "drug_response": "drug_response",
    "risk_factor": "risk_factor",
    "association": "association",
    "protective": "protective",
    "not_provided": "not_provided",
    "other": "other",
}


def _map_clinvar_part(p: Column) -> Column:
    out = F.lower(p)
    for raw, norm in reversed(CLINVAR_SIGNIFICANCE_MAP.items()):
        out = F.when(p == raw, F.lit(norm)).otherwise(out)
    return out


def normalize_clinvar_sig(raw: Column) -> Column:
    """Normalize a ClinVar CLNSIG value (type_mapping.py:106-138).

    Compound values split on ','/'/' are mapped token-wise, then resolved
    by clinical priority: pathogenic > likely_pathogenic > benign >
    likely_benign > conflicting > first token.  The benign branch is
    suppressed when ANY token merely CONTAINS "pathogenic" — the
    reference checks `'pathogenic' not in str(normalized_parts)`, a
    substring test over the list repr, and unmapped tokens like
    "pathogenic_low_penetrance" must keep tripping it here.
    NULL / empty input -> 'not_provided', as in the reference.
    """
    parts = F.transform(
        F.split(F.translate(raw, "/", ","), ","), lambda p: F.trim(p)
    )
    mapped = F.transform(parts, _map_clinvar_part)
    contains_pathogenic = F.exists(mapped, lambda m: m.contains("pathogenic"))
    resolved = (
        F.when(F.array_contains(mapped, "pathogenic"), "pathogenic")
        .when(F.array_contains(mapped, "likely_pathogenic"), "likely_pathogenic")
        .when(F.array_contains(mapped, "benign") & ~contains_pathogenic, "benign")
        .when(F.array_contains(mapped, "likely_benign"), "likely_benign")
        .when(F.array_contains(mapped, "conflicting"), "conflicting")
        .otherwise(F.coalesce(F.try_element_at(mapped, F.lit(1)), F.lit("not_provided")))
    )
    return F.when(raw.isNull() | (raw == ""), F.lit("not_provided")).otherwise(resolved)


def register_sql_functions(spark: SparkSession) -> None:
    """Register SQL-callable twins of the reference's Postgres functions
    (validation/sql_functions.py:20-26) so `spark.sql` keeps parity.

    The DataFrame layer uses the column expressions above (codegen); these
    registrations are the SQL-surface shims — `hwe_exact_test` is the
    vectorized pandas UDF, the rest are thin Python twins (only for ad-hoc
    SQL; never used in the hot path).
    """
    from vcf_pg_loader_spark.functions.hwe import hwe_exact_test, hwe_pvalue_py

    spark.udf.register("hwe_exact_test", hwe_exact_test)

    def _alleles_match_py(r1, a1, r2, a2):
        if None in (r1, a1, r2, a2):
            return None
        comp = str.maketrans("ACGT", "TGCA")
        r1, a1, r2, a2 = r1.upper(), a1.upper(), r2.upper(), a2.upper()
        r1c, a1c = r1.translate(comp), a1.translate(comp)
        return (
            (r1 == r2 and a1 == a2)
            or (r1 == a2 and a1 == r2)
            or (r1c == r2 and a1c == a2)
            or (r1c == a2 and a1c == r2)
        )

    def _n_eff_py(c, k):
        if c is None or k is None or c == 0 or k == 0:
            return None
        return 4.0 * c * k / (c + k)

    def _af_from_dosages_py(ds):
        if ds is None:
            return None
        # SQL numeric literals may arrive as Decimal — normalize to float
        valid = [float(d) for d in ds if d is not None]
        if not valid:
            return None
        return sum(valid) / (2.0 * len(valid))

    spark.udf.register("alleles_match", _alleles_match_py, "boolean")
    spark.udf.register("n_eff", _n_eff_py, "double")
    spark.udf.register("af_from_dosages", _af_from_dosages_py, "double")
    # keep a SQL handle on the exact-python HWE too (scalar, driver tests)
    spark.udf.register("hwe_exact_test_scalar", hwe_pvalue_py, "double")
