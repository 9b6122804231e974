"""Property-based parity: the generated Column-expression cascade in
``operators.normalize`` must agree with a row-at-a-time Python model of
the same spec (reference ``normalize_value`` semantics,
etl_pipeline.py:167-207) on generated inputs from every branch.

The model is written from the spec, not ported code; branch generators
stay inside ranges where Python's ``str()`` and Spark's cast-to-string
renderings provably coincide (no scientific notation, no inf/nan)."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.normalize import (
    EMAIL_RE,
    FALSE_TOKENS,
    NULL_TOKENS,
    PERCENT_RE,
    PHONE_RE,
    TRUE_TOKENS,
    normalize_expr,
)


def model_normalize(v: str | None) -> str | None:
    """Spec model of the T1–T8 cascade (row-at-a-time)."""
    if v is None:
        return None
    s = v.strip()
    sl = s.lower()
    if sl in NULL_TOKENS:
        return None
    if sl in TRUE_TOKENS:
        return "True"
    if sl in FALSE_TOKENS:
        return "False"
    m = re.match(PERCENT_RE, s)
    if m:
        return str(float(m.group(1)) / 100.0)
    if re.match(EMAIL_RE, s):
        return sl
    if re.match(PHONE_RE, s):
        return re.sub(r"[^0-9]", "", s)
    no_cur = re.sub(r"[,$₹]", "", s).strip()
    if re.match(r"^[+-]?\d+$", no_cur):
        return str(int(no_cur))
    if re.match(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$", no_cur):
        return str(float(no_cur))
    # date battery branch is exercised by its own deterministic cases in
    # test_etl_core; free text here contains no digits, so it can't
    # reach a successful date parse
    return sl


# ---- branch generators -----------------------------------------------------
nulls = st.sampled_from(["na", "N/A", " null ", "NONE", "", "nan", "  "])
bools = st.sampled_from(["true", "YES", " 1", "False", "no", "0 "])
percents = st.builds(
    lambda a, b: f"{a}.{b}%" if b is not None else f"{a}%",
    st.integers(0, 9999),
    st.one_of(st.none(), st.integers(1, 99)),
)
emails = st.builds(
    lambda u, d, t: f"{u}@{d}.{t}",
    st.text(alphabet="abcXYZ19.", min_size=1, max_size=10).filter(
        lambda s: re.match(r"^[\w\.\+-]+$", s)
    ),
    st.text(alphabet="abcxyz", min_size=1, max_size=8),
    st.sampled_from(["com", "net", "io"]),
)
phones = st.builds(
    lambda pre, parts: pre + " ".join(parts),
    st.sampled_from(["", "+"]),
    st.lists(
        st.text(alphabet="0123456789-() ", min_size=1, max_size=6).filter(
            lambda s: any(c.isdigit() for c in s)
        ),
        min_size=1,
        max_size=3,
    ),
)
ints = st.builds(
    lambda sym, n, commas: f"{sym}{n:,}" if commas else f"{sym}{n}",
    st.sampled_from(["", "$", "₹"]),
    st.integers(0, 10**12),
    st.booleans(),
)
floats = st.builds(
    lambda sym, whole, frac: f"{sym}{whole}.{frac}",
    st.sampled_from(["", "$"]),
    st.integers(0, 10**6),
    st.integers(1, 999_999),
)
free_text = st.text(
    alphabet=st.characters(whitelist_categories=["Lu", "Ll", "Zs"], max_codepoint=0x2FF),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip() and s.strip().lower() not in NULL_TOKENS + TRUE_TOKENS + FALSE_TOKENS)

values = st.one_of(nulls, bools, percents, emails, phones, ints, floats, free_text)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None)
@given(batch=st.lists(values, min_size=1, max_size=60))
def test_normalize_expr_matches_model(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string")
    got = [r["out"] for r in df.select(normalize_expr(F.col("v")).alias("out")).collect()]
    want = [model_normalize(v) for v in batch]
    assert got == want, [
        (b, g, w) for b, g, w in zip(batch, got, want) if g != w
    ][:5]
