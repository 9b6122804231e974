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


# ---------------------------------------------------------------------------
# T7 fuzzy dates: differential test against dateutil itself (the exact
# library the reference calls, available in this container) on the
# equivalence subset, plus pins for every documented divergence.
# ---------------------------------------------------------------------------

from datetime import datetime  # noqa: E402

from dateutil.parser import parse as dateutil_parse  # noqa: E402

# strftime renderings whose dateutil parse our battery must reproduce
# exactly. All contain a character outside [\d\s\-()] so they reach the
# date branch of the cascade (not the phone branch) in both engines.
DATE_RENDERINGS = [
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%d %H:%M:%S",
    "%Y/%m/%d",
    "%B %d, %Y",
    "%b %d, %Y",
    "%B %d, %Y %H:%M:%S",
    "%d %B %Y",
    "%d %b %Y",
    "%m/%d/%Y",
    "%m/%d/%Y %H:%M:%S",
    "%m.%d.%Y",
    "%m-%d-%Y %H:%M:%S",
]

datetimes = st.datetimes(
    min_value=datetime(1900, 1, 1), max_value=datetime(2099, 12, 28)
)
date_strings = st.builds(
    lambda dt, fmt: dt.strftime(fmt), datetimes, st.sampled_from(DATE_RENDERINGS)
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None)
@given(batch=st.lists(date_strings, min_size=1, max_size=50))
def test_date_battery_matches_dateutil(spark, batch):
    df = spark.createDataFrame([(v,) for v in batch], "v string")
    got = [r["out"] for r in df.select(normalize_expr(F.col("v")).alias("out")).collect()]
    want = [dateutil_parse(v).isoformat() for v in batch]
    assert got == want, [
        (b, g, w) for b, g, w in zip(batch, got, want) if g != w
    ][:5]


def test_date_battery_day_first_fallback_matches_dateutil(spark):
    """Day > 12 flips dateutil to day-first on ambiguous forms; the
    battery's month-first-then-day-first ordering reproduces that."""
    cases = ["25/03/2024", "03/25/2024", "5.3.2024", "25.3.2024", "March 5th, 2024"]
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    got = [r["out"] for r in df.select(normalize_expr(F.col("v")).alias("out")).collect()]
    want = [dateutil_parse(v).isoformat() for v in cases]
    assert got == want, list(zip(cases, got, want))


def test_date_battery_documented_divergences(spark):
    """The exact divergence set from dateutil, pinned (see
    operators/normalize.py DATE_FORMATS docstring). If one of these
    starts agreeing, the doc must be updated."""
    cases = {
        # 2-digit years 76-99: we pin 2000-2099, dateutil (in 2026)
        # resolves within [1976, 2075] -> 19xx
        "03/05/99": "2099-03-05T00:00:00",
        # partial dates needing today-fill -> lower-case passthrough
        "march 2024": "march 2024",
        "friday": "friday",
        # unsupported month abbreviation ("Sept" is dateutil-only)
        "5 sept 2024": "5 sept 2024",
        # timezone *names* are not recognized (offsets are)
        "2024-03-05t10:00:00 est": "2024-03-05t10:00:00 est",
    }
    df = spark.createDataFrame([(v,) for v in cases], "v string")
    got = {r["v"]: r["out"] for r in df.select(
        "v", normalize_expr(F.col("v")).alias("out")).collect()}
    assert got == cases, got
    # and dateutil genuinely disagrees on the divergent parseables
    assert dateutil_parse("03/05/99").isoformat() == "1999-03-05T00:00:00"
    assert dateutil_parse("5 Sept 2024").isoformat() == "2024-09-05T00:00:00"


def test_iso_dates_take_phone_branch_like_reference(spark):
    """Reference quirk preserved: dash-only numeric dates match the
    phone regex before the date branch in BOTH engines
    (etl_pipeline.py:192-194), so they become digit strings."""
    df = spark.createDataFrame([("2024-03-05",), ("05-03-2024",)], "v string")
    got = [r["out"] for r in df.select(normalize_expr(F.col("v")).alias("out")).collect()]
    assert got == ["20240305", "05032024"]
