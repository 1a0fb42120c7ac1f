"""echtvar-compatible filter expressions → Spark SQL.

Reference semantics (expression.py:20-235): `&&`→AND, `||`→OR, `==`→`=`,
`!=`→`<>`, IS [NOT] NULL passthrough, string/numeric literals, field
validation against the available annotation columns, paren/quote balance
checks.  The translated string goes straight to `F.expr` / `spark.sql`
— Catalyst is the real parser/planner, exactly as Postgres was for the
reference.

Reimplemented with a regex token scanner (not a char loop)."""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(
    r"""
    (?P<str>   '(?:[^'\\]|\\.)*' | "(?:[^"\\]|\\.)*" )
  | (?P<num>   -?\d+(?:\.\d+)?(?:[eE][+-]?\d+)? )
  | (?P<andor> && | \|\| )
  | (?P<cmp>   <= | >= | == | != | <> | < | > | = )
  | (?P<paren> [()] )
  | (?P<word>  [A-Za-z_][A-Za-z0-9_]* )
    """,
    re.VERBOSE,
)

_KEYWORDS = {"IS", "NULL", "NOT", "AND", "OR", "TRUE", "FALSE", "IN", "LIKE"}

_OP_MAP = {"&&": "AND", "||": "OR", "==": "=", "!=": "<>"}


class ExpressionError(ValueError):
    pass


def tokenize(expr: str) -> list[tuple[str, str]]:
    """Token stream as (kind, text); raises on unscannable input."""
    tokens: list[tuple[str, str]] = []
    pos = 0
    n = len(expr)
    while pos < n:
        if expr[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise ExpressionError(f"Unexpected character at {pos}: {expr[pos]!r}")
        tokens.append((m.lastgroup, m.group()))
        pos = m.end()
    return tokens


def validate(expr: str, available_fields: set[str]) -> list[str]:
    """Error list (empty == valid): unknown fields, unbalanced parens,
    unclosed strings (reference expression.py:79-128)."""
    errors: list[str] = []
    if not expr or not expr.strip():
        return errors

    # unclosed string check first (tokenizer would reject it)
    n_sq = len(re.findall(r"(?<!\\)'", expr))
    if n_sq % 2 == 1:
        errors.append("Unclosed string literal")
        return errors

    try:
        tokens = tokenize(expr)
    except ExpressionError as e:
        errors.append(str(e))
        return errors

    for kind, text in tokens:
        if kind == "word" and text.upper() not in _KEYWORDS:
            if text not in available_fields:
                errors.append(f"Unknown field: '{text}'")

    depth = 0
    for kind, text in tokens:
        if text == "(":
            depth += 1
        elif text == ")":
            depth -= 1
            if depth < 0:
                errors.append("Unbalanced parentheses")
                break
    if depth != 0 and not any("Unbalanced" in e for e in errors):
        errors.append("Unbalanced parentheses")
    return errors


def extract_fields(expr: str) -> set[str]:
    """Field names referenced by the expression (expression.py:215-235)."""
    if not expr:
        return set()
    return {
        text
        for kind, text in tokenize(expr)
        if kind == "word" and text.upper() not in _KEYWORDS
    }


def to_sql(expr: str, available_fields: set[str]) -> str:
    """Translate to a Spark-SQL boolean expression ('TRUE' when empty)."""
    if not expr or not expr.strip():
        return "TRUE"
    errors = validate(expr, available_fields)
    if errors:
        raise ExpressionError(f"Invalid expression: {'; '.join(errors)}")
    out: list[str] = []
    for kind, text in tokenize(expr):
        out.append(_OP_MAP.get(text, text))
    return " ".join(out)


def apply_filter(df, expr: str):
    """df.filter with a validated echtvar expression."""
    from pyspark.sql import functions as F

    return df.filter(F.expr(to_sql(expr, set(df.columns))))
