"""VersionedTable: snapshot isolation, time travel, crash sweep."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_project_auraverse_spark.operators.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _vals(df):
    return {(r["k"], r["v"]) for r in df.collect()}


def test_commit_read_history_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    assert t.latest_version() is None
    v1 = t.commit(_df(spark, [(1, "a")]), ts=100.0, note="init")
    v2 = t.commit(_df(spark, [(1, "a2"), (2, "b")]), ts=200.0)
    assert (v1, v2) == (1, 2)
    assert t.latest_version() == 2
    assert _vals(t.read(spark)) == {(1, "a2"), (2, "b")}
    assert _vals(t.read(spark, version=1)) == {(1, "a")}
    assert [e["version"] for e in t.history()] == [1, 2]
    assert t.history()[0]["note"] == "init"
    # time travel: at ts 150 only v1 existed; exactly at a commit ts
    # the commit is visible
    assert _vals(t.time_travel(spark, 150.0)) == {(1, "a")}
    assert _vals(t.time_travel(spark, 200.0)) == {(1, "a2"), (2, "b")}
    with pytest.raises(ValueError):
        t.time_travel(spark, 50.0)
    with pytest.raises(ValueError):
        t.read(spark, version=9)


def test_old_snapshots_are_immutable_across_commits(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.commit(_df(spark, [(1, "a")]), ts=1.0)
    before = _vals(t.read(spark, version=1))
    for i in range(2, 5):
        t.commit(_df(spark, [(i, "x")]), ts=float(i))
    assert _vals(t.read(spark, version=1)) == before


def test_ts_must_not_decrease(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "vt"))
    t.commit(_df(spark, [(1, "a")]), ts=100.0)
    with pytest.raises(ValueError, match="decrease"):
        t.commit(_df(spark, [(2, "b")]), ts=99.0)


def test_crashed_commit_is_invisible_and_swept(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable(root)
    t.commit(_df(spark, [(1, "a")]), ts=1.0)
    # simulate a crash AFTER the snapshot rename but BEFORE the pointer
    # swap: a v-dir exists that no pointer references
    orphan = os.path.join(root, "v000002")
    _df(spark, [(9, "ghost")]).write.parquet(orphan)
    assert t.latest_version() == 1  # reader never sees it
    assert _vals(t.read(spark)) == {(1, "a")}
    # and a tmp-dir crash (before the snapshot rename) likewise
    _df(spark, [(8, "ghost2")]).write.parquet(os.path.join(root, "v000003.tmp.dead"))
    v = t.commit(_df(spark, [(2, "b")]), ts=2.0)  # sweeps, then commits
    assert v == 2
    assert not os.path.exists(os.path.join(root, "v000003.tmp.dead"))
    assert _vals(t.read(spark, version=2)) == {(2, "b")}


def _n_part_files(root: str, version: int) -> int:
    vdir = os.path.join(root, f"v{version:06d}")
    return sum(1 for f in os.listdir(vdir) if f.endswith(".parquet"))


def test_compact_merges_files_preserving_content(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable(root)
    many = _df(spark, [(i, f"x{i}") for i in range(40)]).repartition(8)
    t.commit(many, ts=1.0)
    assert _n_part_files(root, 1) > 1
    before = _vals(t.read(spark))
    v = t.compact(spark, ts=2.0, target_files=1)
    assert v == 2
    assert _n_part_files(root, 2) == 1
    assert _vals(t.read(spark)) == before
    # the pre-compaction snapshot is still readable (immutable)
    assert _vals(t.read(spark, version=1)) == before
    assert t.history()[-1]["note"] == "compact"


def test_vacuum_drops_old_versions_keeps_counter(spark, tmp_path):
    root = str(tmp_path / "vt")
    t = VersionedTable(root)
    for i in range(1, 5):
        t.commit(_df(spark, [(i, "v")]), ts=float(i))
    dropped = t.vacuum(keep_last=2)
    assert dropped == [1, 2]
    assert not os.path.exists(os.path.join(root, "v000001"))
    assert _vals(t.read(spark, version=3)) == {(3, "v")}
    assert _vals(t.read(spark)) == {(4, "v")}
    with pytest.raises(ValueError):
        t.read(spark, version=1)
    # time travel before the retained window is gone too
    with pytest.raises(ValueError):
        t.time_travel(spark, 1.5)
    # the version counter never reuses a vacuumed number
    assert t.commit(_df(spark, [(5, "v")]), ts=5.0) == 5
    with pytest.raises(ValueError):
        t.vacuum(keep_last=0)


def test_diff_classifies_changes(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"))
    v1 = vt.commit(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        ts=1.0,
    )
    v2 = vt.commit(
        spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
        ),
        ts=2.0,
    )
    d = {r["k"]: r for r in vt.diff(spark, ["k"], v1, v2).collect()}
    assert set(d) == {1, 3, 4}
    assert d[1]["_change"] == "delete" and d[1]["old_v"] == "a"
    assert d[3]["_change"] == "update" and (d[3]["old_v"], d[3]["new_v"]) == ("c", "C")
    assert d[4]["_change"] == "insert" and d[4]["new_v"] == "d"
