"""echtvar expression translation (reference expression.py semantics +
tests/test_echtvar_compat.py style cases)."""

from __future__ import annotations

import pytest

from vcf_pg_loader_spark.plans.expression import (
    ExpressionError,
    extract_fields,
    to_sql,
    validate,
)

FIELDS = {"gnomad_af", "clinvar_sig", "impact", "dp"}


class TestTranslate:
    CASES = [
        ("gnomad_af < 0.01", "gnomad_af < 0.01"),
        (
            "gnomad_af < 0.01 && clinvar_sig == 'Pathogenic'",
            "gnomad_af < 0.01 AND clinvar_sig = 'Pathogenic'",
        ),
        ("gnomad_af < 0.01 || gnomad_af IS NULL", "gnomad_af < 0.01 OR gnomad_af IS NULL"),
        ("impact != 'LOW'", "impact <> 'LOW'"),
        ("(dp >= 10) && (gnomad_af <= 0.05)", "( dp >= 10 ) AND ( gnomad_af <= 0.05 )"),
        ("", "TRUE"),
        ("   ", "TRUE"),
    ]

    @pytest.mark.parametrize("expr,expected", CASES)
    def test_translate(self, expr, expected):
        assert to_sql(expr, FIELDS) == expected


class TestValidate:
    def test_unknown_field(self):
        errs = validate("bogus < 1", FIELDS)
        assert any("Unknown field" in e for e in errs)

    def test_unbalanced_parens(self):
        assert any("parenthes" in e.lower() for e in validate("(dp > 1", FIELDS))
        assert any("parenthes" in e.lower() for e in validate("dp > 1)", FIELDS))

    def test_unclosed_string(self):
        assert any("string" in e.lower() for e in validate("clinvar_sig == 'x", FIELDS))

    def test_raises_on_invalid(self):
        with pytest.raises(ExpressionError):
            to_sql("bogus < 1", FIELDS)


def test_extract_fields():
    assert extract_fields("gnomad_af < 0.01 && impact == 'HIGH'") == {
        "gnomad_af",
        "impact",
    }
    assert extract_fields("dp IS NOT NULL") == {"dp"}


def test_filter_end_to_end(spark):
    from vcf_pg_loader_spark.plans.expression import apply_filter

    df = spark.createDataFrame(
        [(0.001, "Pathogenic"), (0.5, "Benign"), (None, "Pathogenic")],
        ["gnomad_af", "clinvar_sig"],
    )
    out = apply_filter(df, "gnomad_af < 0.01 && clinvar_sig == 'Pathogenic'")
    assert out.count() == 1
    out2 = apply_filter(df, "gnomad_af IS NULL || gnomad_af < 0.01")
    assert out2.count() == 2
