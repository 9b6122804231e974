"""Regression guard for the bench artifact's final stdout line.

The external perf gate keeps only the last ~2000 characters of
bench.py's stdout and parses the LAST line as JSON. That contract has
been broken twice (r5: one giant line truncated mid-JSON; r7: the
18-name "core" array + suspect-name list pushed a previously-1972-char
line to ~2600) — each time the round's perf number was silently lost
("parsed": null). These tests pin the final line's rendered size and
shape so a third loss can't ship.
"""

from __future__ import annotations

import json

import bench


def _worst_case_line() -> str:
    # Worst realistic case: every headline entry present, every timing
    # at 3-digit seconds with full 3-decimal width, steal_frac set,
    # all 50 queries flagged suspect.
    timings = {name: 123.456 for name in bench.HEADLINE}
    return bench.render_final_line(
        timings, total=9999.999, sf=0.1, steal_frac=0.0143,
        suspect_count=len(timings),
    )


def test_final_line_under_tail_window() -> None:
    line = _worst_case_line()
    assert len(bench.HEADLINE) >= 50, "worst case must cover 50 entries"
    assert len(line) < 1800, (
        f"bench final line is {len(line)} chars at {len(bench.HEADLINE)} "
        "headline entries; the driver tail window is ~2000 and history "
        "says anything near it gets lost. Move fields to the preceding "
        "stdout line instead."
    )


def test_final_line_shape() -> None:
    parsed = json.loads(_worst_case_line())
    # Exactly the driver-facing fields — adding any list of names here
    # is the known loss mode.
    assert set(parsed) == {"metric", "value", "unit", "sf", "queries", "noise"}
    assert set(parsed["noise"]) == {"steal_frac", "suspect_count"}
    assert isinstance(parsed["noise"]["suspect_count"], int)
    assert parsed["unit"] == "sec"
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    # 3-decimal timings: full-precision floats would widen the line.
    for v in parsed["queries"].values():
        assert round(v, 3) == v


def test_core_subset_and_headline_count() -> None:
    assert set(bench.CORE) <= set(bench.HEADLINE)
    assert len(bench.HEADLINE) == 50, (
        "headline is budgeted at 50 entries; grow the sweep, not this"
    )


def test_window_retry_policy() -> None:
    """The headline self-defense thresholds and best-attempt choice
    (r11 verdict ask #1): >1% steal or >10 suspects means dirty; the
    kept attempt has the fewest suspects, steal breaking ties."""
    assert bench.window_clean(0.009, 10)
    assert not bench.window_clean(0.0302, 2), "r11's destroyed window"
    assert not bench.window_clean(0.005, 19), "suspect blowout alone trips"
    assert bench.window_clean(None, 0), "no /proc/stat platform is clean"
    assert bench.HEADLINE_MAX_ATTEMPTS >= 2, "must actually retry"

    a = {"suspect": ["x"] * 12, "steal": 0.002, "timings": {}}
    b = {"suspect": ["x"] * 3, "steal": 0.03, "timings": {}}
    c = {"suspect": ["x"] * 3, "steal": 0.004, "timings": {}}
    assert bench.cleanest_attempt([a, b, c]) is c
    assert bench.cleanest_attempt([a, b]) is b, "suspects outrank steal"
    d = {"suspect": [], "steal": None, "timings": {}}
    assert bench.cleanest_attempt([c, d]) is d
