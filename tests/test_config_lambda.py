"""D3 enrich-lambda trust boundary: the config-declared lambda
fallback must execute only a whitelisted expression subset (the
reference declares lambdas in config.yaml:10-24 but never executes
them, so anything richer than pure row-dict expressions is refused),
plus the advice-fix checks for sinks row counting and session conf
warnings."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.config_ops import (
    ValidationError,
    compile_config_lambda,
    enrich,
)

# ---------------------------------------------------------------------------
# compile_config_lambda: accepted subset
# ---------------------------------------------------------------------------


def test_lambda_row_get_arithmetic():
    fn = compile_config_lambda("lambda row: (row.get('a') or 0) * 2 + len(str(row['b']))")
    assert fn({"a": 3, "b": "xy"}) == 8
    assert fn({"b": "xy"}) == 2


def test_lambda_conditional_and_methods():
    fn = compile_config_lambda(
        "lambda r: r['name'].strip().lower() if r.get('name') else 'unknown'"
    )
    assert fn({"name": "  ABC "}) == "abc"
    assert fn({}) == "unknown"


def test_lambda_isinstance_containers():
    fn = compile_config_lambda(
        "lambda row: len(row['xs']) if isinstance(row.get('xs'), list) else 0"
    )
    assert fn({"xs": [1, 2, 3]}) == 3
    assert fn({"xs": "nope"}) == 0


# ---------------------------------------------------------------------------
# compile_config_lambda: rejected constructs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "src",
    [
        "lambda row: __import__('os').system('true')",  # import machinery
        "lambda row: row.__class__",  # dunder attribute escape
        "lambda row: ().__class__.__bases__",  # classic sandbox escape
        "lambda row: open('/etc/passwd')",  # non-whitelisted name
        "lambda row: exec('x=1')",  # non-whitelisted name
        "lambda row: [x for x in row]",  # comprehension (not in subset)
        "lambda row, extra: row",  # wrong arity
        "lambda *rows: rows",  # varargs
        "import os",  # not an expression
        "lambda row: (x := 1)",  # walrus
        "os.system('true')",  # not a lambda
    ],
)
def test_lambda_rejections(src):
    with pytest.raises(ValidationError):
        compile_config_lambda(src)


def test_enrich_runs_validated_fallback_lambda(spark):
    df = spark.createDataFrame([("a", 2), ("bb", None)], "name string, score int")
    out = enrich(df, [{"col": "score_x10", "func": "lambda row: (row.get('score') or 0) * 10"}])
    got = {r["name"]: r["score_x10"] for r in out.collect()}
    assert got == {"a": "20", "bb": "0"}


def test_enrich_raises_on_hostile_config_lambda(spark):
    df = spark.createDataFrame([("a",)], "name string")
    with pytest.raises(ValidationError):
        enrich(df, [{"col": "evil", "func": "lambda row: __import__('os')"}])


# ---------------------------------------------------------------------------
# sinks: embedded-newline row count (advice fix)
# ---------------------------------------------------------------------------


def test_write_csv_single_counts_rows_with_embedded_newlines(spark, tmp_path):
    from etl_pipeline_project_auraverse_spark.sinks import write_csv_single

    df = spark.createDataFrame(
        [("a", "line1\nline2"), ("b", "plain"), ("c", "x\ny\nz")],
        "id string, text string",
    )
    dest = str(tmp_path / "out.csv")
    assert write_csv_single(df, dest) == 3


# ---------------------------------------------------------------------------
# session: warn when getOrCreate ignores startup confs (advice fix)
# ---------------------------------------------------------------------------


def test_get_spark_warns_on_ignored_startup_conf(spark):
    from etl_pipeline_project_auraverse_spark.session import get_spark

    current = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            got = get_spark(extra_conf={"spark.driver.memory": "1234g"})
        assert got is spark  # session reuse is the scenario under test
        msgs = [str(w.message) for w in caught if issubclass(w.category, RuntimeWarning)]
        assert any("spark.driver.memory" in m for m in msgs), msgs
    finally:
        # getOrCreate DOES apply runtime SQL confs to the reused session
        # (that's Spark behavior, not a bug) — restore the fixture's value
        spark.conf.set("spark.sql.shuffle.partitions", current)
