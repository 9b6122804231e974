"""Config-declared transform/validation ops (D1–D5, reference
``backend/config.yaml:7-33``).

The reference *declares* these in config but never executes them
(``cfg['transform']`` is read nowhere in etl_pipeline.py) — this module
implements them for real, as the declared capability surface demands.

Every enrich rule from config.yaml:10-24 is recognized by name and
compiled to a native Column expression (JVM-side); an unrecognized
lambda falls back to an Arrow-batched pandas UDF applied over the full
row struct — the slow path, kept off the named rules.

Trust boundary: the reference declares these lambdas in config.yaml but
never executes them, so executing them here adds a config-to-code
surface the reference doesn't have. The fallback therefore refuses
``eval`` of arbitrary source: rule lambdas are parsed and validated
against a whitelist of expression AST nodes, row-dict methods, and
pure builtins (:func:`compile_config_lambda`) — no imports, no
attribute escapes (``__class__`` etc.), no names beyond the row
argument and the builtin whitelist. Anything outside that subset
raises :class:`ValidationError`; genuinely arbitrary code must come in
as a registered named rule from operator-owned Python, not config.
"""

from __future__ import annotations

import ast
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ValidationError(Exception):
    """Raised when a config-declared validation fails (D4/D5)."""


def drop_duplicates(df: DataFrame) -> DataFrame:
    """D1 (config.yaml:8). Full-row dedup — one hash-shuffle on all
    columns; at scale prefer dedup on a business key + max(ts)."""
    return df.dropDuplicates()


def drop_na(df: DataFrame, how: str = "any") -> DataFrame:
    """D2 (config.yaml:9)."""
    return df.na.drop(how=how)


def _col_or_null(df: DataFrame, name: str) -> Column:
    """Row-lambda semantics: a missing key reads as null, not an error."""
    return F.col(f"`{name}`") if name in df.columns else F.lit(None)


# The four named rules from config.yaml:10-24, as native expressions.
# Each mirrors the declared Python lambda's semantics over a row dict.
def _score_range(df: DataFrame) -> Column:
    # lambda row: row['score'] if present & not None else []
    c = _col_or_null(df, "score")
    return F.when(c.isNotNull(), c.cast("string")).otherwise(F.lit(""))


def _name_length(df: DataFrame) -> Column:
    # lambda row: len(str(row['name'])) if row.get('name') else 0
    c = _col_or_null(df, "name")
    return F.when(c.isNotNull(), F.length(c.cast("string"))).otherwise(F.lit(0)).cast("long")


def _has_price(df: DataFrame) -> Column:
    # lambda row: 1 if row.get('price') is not None else 0
    return F.when(_col_or_null(df, "price").isNotNull(), 1).otherwise(0).cast("long")


def _num_reviews(df: DataFrame) -> Column:
    # lambda row: len(row['user_reviews']) if it's a list else 0
    if "user_reviews" not in df.columns:
        return F.lit(0).cast("long")
    c = F.col("user_reviews")
    field = next(f for f in df.schema.fields if f.name == "user_reviews")
    if isinstance(field.dataType, T.ArrayType):
        return F.coalesce(F.size(c), F.lit(0)).cast("long")
    # post-flatten the list is a comma-joined string; count elements
    return (
        F.when(F.coalesce(c.cast("string"), F.lit("")) == "", 0)
        .otherwise(F.size(F.split(c.cast("string"), ",")))
        .cast("long")
    )


NAMED_RULES: dict[str, Callable[[DataFrame], Column]] = {
    "score_range": _score_range,
    "name_length": _name_length,
    "has_price": _has_price,
    "num_reviews": _num_reviews,
}


# Pure builtins a config lambda may call; nothing here reaches the
# filesystem, the interpreter, or import machinery.
_LAMBDA_BUILTINS: dict[str, object] = {
    "len": len, "str": str, "int": int, "float": float, "bool": bool,
    "abs": abs, "min": min, "max": max, "round": round, "sum": sum,
    "sorted": sorted, "isinstance": isinstance, "list": list,
    "dict": dict, "tuple": tuple, "set": set, "None": None,
    "True": True, "False": False,
}

# Expression-only AST node whitelist: a lambda over the row dict with
# literals, arithmetic, comparisons, conditionals, containers, and
# whitelisted calls. No comprehensions/await/walrus/starred/f-strings —
# the named-rule escape hatch exists for anything richer.
_ALLOWED_NODES: tuple[type, ...] = (
    ast.Expression, ast.Lambda, ast.arguments, ast.arg,
    ast.Name, ast.Load, ast.Constant,
    ast.Subscript, ast.Slice,
    ast.Call, ast.keyword, ast.Attribute,
    ast.IfExp, ast.Compare, ast.BoolOp, ast.BinOp, ast.UnaryOp,
    ast.And, ast.Or, ast.Not, ast.USub, ast.UAdd,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
    ast.Is, ast.IsNot, ast.In, ast.NotIn,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod, ast.Pow,
    ast.Tuple, ast.List, ast.Dict, ast.Set,
)

# Methods callable on row values (str/dict/list surface); leading
# underscores are rejected before this check even applies.
_ALLOWED_METHODS = frozenset(
    "get lower upper strip lstrip rstrip startswith endswith split join "
    "replace count index find keys values items".split()
)


def compile_config_lambda(func_src: str) -> Callable:
    """Parse + validate a config-declared rule lambda, refusing anything
    outside the whitelisted expression subset (see module docstring).
    Returns the compiled single-argument callable."""
    try:
        tree = ast.parse(func_src.strip(), mode="eval")
    except SyntaxError as exc:
        raise ValidationError(f"enrich rule is not a valid expression: {exc}") from None
    lam = tree.body
    if not isinstance(lam, ast.Lambda):
        raise ValidationError("enrich rule must be a single lambda expression")
    a = lam.args
    if (
        len(a.args) + len(a.posonlyargs) != 1
        or a.vararg or a.kwarg or a.kwonlyargs or a.defaults or a.kw_defaults
    ):
        raise ValidationError("enrich lambda must take exactly one argument (the row dict)")
    row_arg = (a.args or a.posonlyargs)[0].arg
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValidationError(
                f"enrich lambda uses unsupported syntax: {type(node).__name__}"
            )
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_") or node.attr not in _ALLOWED_METHODS:
                raise ValidationError(
                    f"enrich lambda may not access attribute {node.attr!r}"
                )
        if isinstance(node, ast.Name) and node.id != row_arg and node.id not in _LAMBDA_BUILTINS:
            raise ValidationError(f"enrich lambda references unknown name {node.id!r}")
    code = compile(tree, "<config-lambda>", "eval")
    return eval(code, {"__builtins__": {}, **_LAMBDA_BUILTINS})  # noqa: S307 - AST-validated subset


def _lambda_fallback(df: DataFrame, col_name: str, func_src: str) -> DataFrame:
    """D3 fallback: config lambda over the row dict, executed as an
    Arrow-batched pandas UDF (the UDF surface the reference's config
    implies). Result rendered to string (dynamic-type model)."""
    fn = compile_config_lambda(func_src)

    @F.pandas_udf(T.StringType())
    def apply_rule(batch: pd.DataFrame) -> pd.Series:
        # None-faithful row dicts: Arrow surfaces SQL NULL as NaN/NaT in
        # numeric/datetime pandas columns, but the declared lambdas are
        # written against JSON-record dicts where absent means None
        batch = batch.astype(object).where(batch.notna(), None)

        def run(row: pd.Series):
            try:
                out = fn(row.to_dict())
            except Exception:
                out = None
            return None if out is None else str(out)

        return batch.apply(run, axis=1)

    return df.withColumn(col_name, apply_rule(F.struct(*[F.col(f"`{c}`") for c in df.columns])))


def enrich(df: DataFrame, rules: list[dict]) -> DataFrame:
    """D3 (config.yaml:10-24): add computed columns per declared rule."""
    for rule in rules or []:
        col_name = rule["col"]
        if col_name in NAMED_RULES:
            df = df.withColumn(col_name, NAMED_RULES[col_name](df))
        else:
            df = _lambda_fallback(df, col_name, rule["func"])
    return df


def validate_required_columns(df: DataFrame, required: list[str]) -> list[str]:
    """D4 (config.yaml:26-29): report (not raise) missing columns, so a
    run can surface the violation the way the reference's summary
    file would."""
    return [c for c in required or [] if c not in df.columns]


_TYPE_CHECKS = {
    "int": "long",
    "float": "double",
    "str": "string",
    "bool": "boolean",
}


def validate_types(df: DataFrame, types: dict[str, str]) -> dict[str, str]:
    """D5 (config.yaml:30-33): column-type assertions via try_cast —
    a column 'passes' as int/float if every non-null value casts
    cleanly. Returns {column: problem} for violations."""
    problems: dict[str, str] = {}
    for col, want in (types or {}).items():
        if col not in df.columns:
            problems[col] = "missing"
            continue
        if want == "list":
            # post-flatten, lists are comma-joined strings; accept any
            field = next(f for f in df.schema.fields if f.name == col)
            if not isinstance(field.dataType, (T.ArrayType, T.StringType)):
                problems[col] = f"expected list-like, got {field.dataType.simpleString()}"
            continue
        target = _TYPE_CHECKS.get(want)
        if target is None:
            problems[col] = f"unknown declared type {want!r}"
            continue
        bad = df.filter(
            F.col(f"`{col}`").isNotNull()
            & F.col(f"`{col}`").cast("string").try_cast(target).isNull()
        ).limit(1)
        if not bad.isEmpty():
            problems[col] = f"values fail cast to {want}"
    return problems
