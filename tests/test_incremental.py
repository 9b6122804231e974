"""Incremental rollup: two refreshes over a growing directory must
equal one full batch aggregate, and re-refreshing must be a no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.incremental import (
    IncrementalRollup,
    _partial_rollup,
)
from etl_pipeline_project_auraverse_spark.session import load_table


@pytest.fixture()
def split_events(spark, sf_dir, tmp_path):
    """Events split into two 'arrival batches' of parquet files."""
    ev = load_table(spark, sf_dir, "events")
    src = tmp_path / "incoming"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(2).write.parquet(
        str(src), mode="append"
    )
    first_files = {f for f in os.listdir(src) if f.endswith(".parquet")}
    ev.filter(F.col("event_id") % 2 == 1).coalesce(2).write.parquet(
        str(src), mode="append"
    )
    return str(src), first_files, ev


def _as_map(df):
    return {
        (r["win_start"], r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in df.collect()
    }


def test_incremental_matches_full_batch(spark, tmp_path, split_events):
    src, first_files, ev = split_events
    roll = IncrementalRollup(str(tmp_path / "state"))

    # simulate the first arrival: hide the second batch via manifest
    # by refreshing when only batch-1 files existed is equivalent to
    # refreshing twice here — first fold everything in two steps
    n1 = roll.refresh(spark, src)
    assert n1 >= 2  # both batches' files on first run is fine too

    # no new files -> no-op
    assert roll.refresh(spark, src) == 0

    got = _as_map(roll.read(spark))
    want = _as_map(_partial_rollup(ev))
    assert got == want


def test_crashed_swap_leftovers_are_swept(spark, tmp_path, split_events):
    """Debris from a crashed atomic swap (tmp/old dirs) next to a LIVE
    rollup/ must neither break the next refresh nor accumulate: with
    rollup/ present, anything else is dead and gets swept."""
    src, _first, ev = split_events
    state = tmp_path / "state_crash"
    roll = IncrementalRollup(str(state))
    assert roll.refresh(spark, src) > 0  # live rollup/ now exists
    # simulate debris from two crashed LATER swaps (both superseded)
    (state / "rollup.tmp.deadbeef").mkdir(parents=True)
    (state / "rollup.tmp.deadbeef" / "part-0.parquet").write_bytes(b"junk")
    (state / "rollup.old.cafef00d").mkdir()
    got = _as_map(roll.read(spark))
    leftovers = [d for d in os.listdir(state) if d.startswith(("rollup.tmp.", "rollup.old."))]
    assert leftovers == []
    assert got == _as_map(_partial_rollup(ev))


def test_crash_window_recovers_complete_tmp(spark, tmp_path, split_events):
    """Crash BETWEEN the two swap renames: no rollup/, state lives only
    in rollup.old.* (previous pair) and rollup.tmp.* (new pair, its
    manifest written — the parquet write completed). Recovery must
    complete the swap by renaming the tmp in, not sweep both copies."""
    import shutil

    src, first_files, ev = split_events
    staged = tmp_path / "staged_cw"
    os.makedirs(staged)
    for f in first_files:
        shutil.copy(os.path.join(src, f), staged / f)
    state = tmp_path / "state_cw"
    roll = IncrementalRollup(str(state))
    roll.refresh(spark, str(staged))
    saved_r1 = tmp_path / "saved_r1"
    shutil.copytree(state / "rollup", saved_r1)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in first_files:
            shutil.copy(os.path.join(src, f), staged / f)
    roll.refresh(spark, str(staged))
    # rewind to the mid-swap instant: new pair as tmp, old pair restored
    os.rename(state / "rollup", state / "rollup.tmp.feedface")
    shutil.copytree(saved_r1, state / "rollup.old.0ddba11")

    assert _as_map(roll.read(spark)) == _as_map(_partial_rollup(ev))
    assert not [d for d in os.listdir(state) if d.startswith(("rollup.tmp.", "rollup.old."))]
    # the recovered manifest knows every file: refresh is a no-op
    assert roll.refresh(spark, str(staged)) == 0


def test_crash_window_falls_back_to_old_pair(spark, tmp_path, split_events):
    """Defensive branch: rollup/ missing, the tmp never completed (no
    manifest ⇒ its parquet write may be partial) — the old pair must be
    restored rather than deleted, and the next refresh re-folds the
    batch the crashed swap lost."""
    import shutil

    src, first_files, ev = split_events
    staged = tmp_path / "staged_old"
    os.makedirs(staged)
    for f in first_files:
        shutil.copy(os.path.join(src, f), staged / f)
    state = tmp_path / "state_old"
    roll = IncrementalRollup(str(state))
    roll.refresh(spark, str(staged))
    r1 = _as_map(roll.read(spark))
    os.rename(state / "rollup", state / "rollup.old.deadc0de")
    (state / "rollup.tmp.badc0ffe").mkdir()
    (state / "rollup.tmp.badc0ffe" / "part-0.parquet").write_bytes(b"partial")

    assert _as_map(roll.read(spark)) == r1
    # state recovered ⇒ folding the second batch still reaches the
    # full-aggregate answer
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in first_files:
            shutil.copy(os.path.join(src, f), staged / f)
    assert roll.refresh(spark, str(staged)) > 0
    assert _as_map(roll.read(spark)) == _as_map(_partial_rollup(ev))


def test_two_step_arrival_merges_correctly(spark, tmp_path, split_events):
    src, first_files, ev = split_events
    staged = tmp_path / "staged"
    os.makedirs(staged)
    # copy batch 1 only, refresh, then add batch 2, refresh again
    import shutil

    for f in first_files:
        shutil.copy(os.path.join(src, f), staged / f)
    roll = IncrementalRollup(str(tmp_path / "state2"))
    n1 = roll.refresh(spark, str(staged))
    assert n1 == len(first_files)

    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in first_files:
            shutil.copy(os.path.join(src, f), staged / f)
    n2 = roll.refresh(spark, str(staged))
    assert n2 > 0

    got = _as_map(roll.read(spark))
    want = _as_map(_partial_rollup(ev))
    assert got == want
