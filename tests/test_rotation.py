"""Attestation-rotation invariants.

The external harness samples the FIRST ~50 registry entries, and
``queries/__init__._FRONT`` silently ignores names that don't resolve
— so a typo'd front pin would drop a query from the round's sample
with no error anywhere. These tests make the rotation contract
explicit: every pinned name must resolve, and every query the ledger
has never seen attested must sit inside the sample window.
"""

from __future__ import annotations

import json
import os

from etl_pipeline_project_auraverse_spark import queries as Q

Q.load_all()

SAMPLE_WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_front_pin_resolves():
    missing = [n for n in Q._FRONT if n not in Q.QUERIES]
    assert not missing, f"_FRONT names with no registered query: {missing}"


def test_front_pins_are_unique():
    assert len(Q._FRONT) == len(set(Q._FRONT)), "duplicate _FRONT entries"


def test_never_attested_queries_lead_the_registry():
    """Every registered query without a recorded driver attestation
    must appear within the harness's sample window, or it can never
    become attested."""
    path = os.path.join(REPO, "ATTESTATION.json")
    ledger = json.load(open(path))
    order = list(Q.QUERIES)
    window = set(order[:SAMPLE_WINDOW])
    # ignore ledger entries for since-renamed/removed queries
    stale = [n for n in ledger["never_attested"] if n not in Q.QUERIES]
    assert not stale, f"ledger names missing from the registry: {stale}"
    outside = [n for n in ledger["never_attested"] if n not in window]
    assert not outside, (
        f"never-attested queries outside the first {SAMPLE_WINDOW} "
        f"registry slots (they can never be sampled): {outside}"
    )
