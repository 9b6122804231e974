"""CDC apply / merge_snapshot semantics: latest-wins, tombstones,
out-of-order deletes, revive-after-delete, idempotent re-merge."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.operators.cdc import (
    apply_changes,
    merge_snapshot,
)

COLS = ["k", "seq", "op", "val"]


def _feed(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _state(df):
    return {r["k"]: (r["seq"], r["val"]) for r in df.collect()}


def test_latest_wins_per_key(spark):
    feed = _feed(
        spark,
        [(1, 1, "U", "a"), (1, 3, "U", "c"), (1, 2, "U", "b"), (2, 1, "U", "x")],
    )
    out = apply_changes(feed, ["k"], ["seq", "val"])
    assert _state(out) == {1: (3, "c"), 2: (1, "x")}


def test_winning_delete_tombstones_key(spark):
    feed = _feed(spark, [(1, 1, "U", "a"), (1, 2, "D", "a"), (2, 1, "U", "x")])
    out = apply_changes(feed, ["k"], ["seq", "val"], op_col="op")
    assert _state(out) == {2: (1, "x")}


def test_stale_delete_is_noop_and_reinsert_revives(spark):
    # delete at seq 2 loses to the later upsert at seq 3
    feed = _feed(spark, [(1, 1, "U", "a"), (1, 2, "D", "a"), (1, 3, "U", "z")])
    out = apply_changes(feed, ["k"], ["seq", "val"], op_col="op")
    assert _state(out) == {1: (3, "z")}


def test_merge_advances_base_snapshot(spark):
    base = _feed(spark, [(1, 1, "U", "a"), (2, 5, "U", "x")])
    batch = _feed(spark, [(1, 2, "U", "b"), (2, 4, "U", "stale"), (3, 1, "U", "new")])
    out = merge_snapshot(base, batch, ["k"], ["seq"], op_col="op")
    # key 1 advances, key 2 keeps the newer base row, key 3 inserts
    assert _state(out) == {1: (2, "b"), 2: (5, "x"), 3: (1, "new")}
    assert out.columns == COLS  # helper columns never escape


def test_merge_delete_removes_from_base(spark):
    base = _feed(spark, [(1, 1, "U", "a"), (2, 1, "U", "x")])
    batch = _feed(spark, [(2, 2, "D", "x")])
    out = merge_snapshot(base, batch, ["k"], ["seq"], op_col="op")
    assert _state(out) == {1: (1, "a")}


def test_reapplying_same_batch_is_idempotent(spark):
    base = _feed(spark, [(9, 0, "U", "seed")])
    batch = _feed(
        spark, [(1, 1, "U", "a"), (1, 2, "U", "b"), (2, 2, "D", "x"), (9, 1, "U", "s2")]
    )
    once = merge_snapshot(base, batch, ["k"], ["seq", "val"], op_col="op")
    twice = merge_snapshot(once, batch, ["k"], ["seq", "val"], op_col="op")
    assert _state(once) == _state(twice) == {1: (2, "b"), 9: (1, "s2")}


def test_apply_changes_matches_reference_fold(spark):
    """Differential: random feeds against a dict-based latest-wins fold
    (sequential reference semantics), including duplicate sequence
    tiebreaking via the unique change id."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.integers(0, 5),  # key
        st.integers(0, 3),  # seq (collides often)
        st.sampled_from(["U", "U", "U", "D"]),
        st.integers(0, 100),  # change id: unique-ified below
    )

    @settings(max_examples=20, deadline=None)
    @given(st.lists(row, min_size=1, max_size=30))
    def run(rows):
        # make the change id unique: it is the final tiebreaker
        rows = [(k, s, op, i) for i, (k, s, op, _cid) in enumerate(rows)]
        want = {}
        for k, s, op, cid in sorted(rows, key=lambda r: (r[1], r[3])):
            want[k] = (s, op, cid)
        want = {k: v for k, v in want.items() if v[1] != "D"}
        feed = spark.createDataFrame(rows, ["k", "seq", "op", "cid"])
        got = {
            r["k"]: (r["seq"], r["op"], r["cid"])
            for r in apply_changes(feed, ["k"], ["seq", "cid"], op_col="op").collect()
        }
        assert got == want, (rows, got, want)

    run()


def test_merge_is_batch_boundary_independent(spark):
    """Applying a feed as one batch, or split at ANY boundary into two
    sequential merge_snapshot calls, must land on the same snapshot —
    the invariant that makes micro-batch sizing a pure tuning knob."""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(
        st.integers(0, 4), st.integers(0, 3), st.sampled_from(["U", "U", "D"])
    )

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=2, max_size=16), st.data())
    def run(rows, data):
        rows = [(k, s, op, i) for i, (k, s, op) in enumerate(rows)]
        cut = data.draw(st.integers(1, len(rows) - 1))
        cols = ["k", "seq", "op", "cid"]
        whole = apply_changes(
            spark.createDataFrame(rows, cols), ["k"], ["seq", "cid"]
        )
        base = apply_changes(
            spark.createDataFrame(rows[:cut], cols), ["k"], ["seq", "cid"]
        )
        split = merge_snapshot(
            base, spark.createDataFrame(rows[cut:], cols), ["k"], ["seq", "cid"]
        )
        # compare INCLUDING tombstone rows (op filter is a read-time
        # concern; the stored state must agree)
        sig = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
        assert sig(split) == sig(whole), (rows, cut)

    run()
