"""Cross-query memoized index builds (the shared IVFADC scores table,
co-purchase pair graph, logreg weights): identity, release, and
clearCache-recovery contracts. These memos live OUTSIDE the per-query
cache registry, so their lifecycle needs its own pins — a silent drop
would turn the shared builds back into per-query rebuilds, and a
broken recovery would crash every consumer after catalog.clearCache().
"""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.cache import release_memos
from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all

load_all()


def _rows(spark, name, sf_dir):
    return sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))


def _live(df) -> bool:
    # is_cached reflects the persist REQUEST and survives clearCache;
    # storageLevel asks the cache manager (the real liveness signal)
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_ivfadc_memo_identity_and_recovery(spark, sf_dir):
    """Both IVFADC consumers must return identical values whether the
    scores table is freshly built, memo-reused, cleared by
    catalog.clearCache(), or dropped by release_memos()."""
    import etl_pipeline_project_auraverse_spark.queries.pq as pq

    first = _rows(spark, "q_ann_ivfadc_residual_topk", sf_dir)
    assert pq._SCORES_MEMO, "build did not register in the memo"
    memo_df = next(iter(pq._SCORES_MEMO.values()))
    assert _live(memo_df)

    again = _rows(spark, "q_ann_ivfadc_residual_topk", sf_dir)
    assert again == first  # memo hit, same values

    spark.catalog.clearCache()
    assert not _live(memo_df)
    recovered = _rows(spark, "q_ann_ivfadc_residual_topk", sf_dir)
    assert recovered == first  # re-persisted transparently
    assert _live(memo_df)

    release_memos()
    assert not _live(memo_df)
    dropped = _rows(spark, "q_ann_ivfadc_residual_topk", sf_dir)
    assert dropped == first


def test_copurchase_pairs_memo_shared_across_queries(spark, sf_dir):
    """kcore and triangle both read the memoized pair graph; the memo
    key must hold exactly one corpus and survive both consumers."""
    import etl_pipeline_project_auraverse_spark.queries.graph as graph

    k1 = _rows(spark, "q_kcore_copurchase", sf_dir)
    assert len(graph._PAIRS_MEMO) == 1
    pairs_df = next(iter(graph._PAIRS_MEMO.values()))
    t1 = _rows(spark, "q_triangle_copurchase", sf_dir)
    assert next(iter(graph._PAIRS_MEMO.values())) is pairs_df  # no rebuild
    assert _rows(spark, "q_kcore_copurchase", sf_dir) == k1
    assert _rows(spark, "q_triangle_copurchase", sf_dir) == t1


def test_logreg_weight_memo_is_deterministic(spark, sf_dir):
    """The fitted weights memo must hand back the exact floats a fresh
    fit produces."""
    import etl_pipeline_project_auraverse_spark.queries.pq as pq

    feat1, w1a, w2a = pq._logreg_fit(spark, sf_dir)
    assert pq._LOGREG_W_MEMO  # populated
    pq._LOGREG_W_MEMO.clear()
    feat2, w1b, w2b = pq._logreg_fit(spark, sf_dir)  # fresh fit
    assert w1a == w1b and w2a == w2b


def test_pair_memo_clearcache_recovery_end_to_end(spark, sf_dir):
    """The r9 verdict's driver-order pin: kcore → clearCache → kcore
    must RECOVER the pair-graph memo (re-persist + eager materialize
    from the parquet snapshot), not rebuild per scan. Fails if the
    liveness check regresses to ``is_cached`` (which stays True after
    clearCache, so recovery would never fire) or if the snapshot-read
    plan regresses to a lineitem re-derivation."""
    import etl_pipeline_project_auraverse_spark.queries.graph as graph

    first = _rows(spark, "q_kcore_copurchase", sf_dir)
    ((key, memo),) = list(graph._PAIRS_MEMO.items())
    assert _live(memo)

    spark.catalog.clearCache()
    lvl = memo.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)  # really dropped
    # Pin WHY is_cached is the wrong signal: it still claims cached.
    # If a future Spark makes is_cached reflect real liveness, this
    # assert flags that the recovery comment/logic deserve a re-look.
    assert memo.is_cached

    assert _rows(spark, "q_kcore_copurchase", sf_dir) == first
    memo2 = graph._PAIRS_MEMO[key]
    assert memo2 is memo  # recovered in place, not rebuilt
    assert _live(memo2)  # re-persisted by the liveness check
    # eagerly MATERIALIZED, not just re-marked: cached partitions exist
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    assert any(i.numCachedPartitions() > 0 for i in infos)
    # and the memo scans the compact snapshot, not lineitem
    # (inputFiles() is empty on a cached DF; the physical plan's
    # FileScan location is the reliable handle)
    plan = memo2._jdf.queryExecution().sparkPlan().toString()
    assert "memo_snapshots" in plan
    assert "lineitem" not in plan


def test_dedup_maintained_tables_memo_recovery(spark, sf_dir):
    """The r10 dedup maintained tables (capped shingle index, J>=0.5
    pair stats, cluster assignments) share the same lifecycle contract
    as the older memos: consumers return identical values on fresh
    build, memo hit, clearCache recovery, and release_memos rebuild."""
    import etl_pipeline_project_auraverse_spark.queries.dedup as dedup

    first = _rows(spark, "q_dedup_ngram_jaccard", sf_dir)
    clusters = _rows(spark, "q_dedup_clusters", sf_dir)
    assert dedup._CAPPED_MEMO and dedup._PAIR_MEMO and dedup._CLUSTER_MEMO
    pair_df = next(iter(dedup._PAIR_MEMO.values()))
    cluster_df = next(iter(dedup._CLUSTER_MEMO.values()))
    assert _live(pair_df) and _live(cluster_df)

    spark.catalog.clearCache()
    assert not _live(pair_df) and not _live(cluster_df)
    assert _rows(spark, "q_dedup_ngram_jaccard", sf_dir) == first
    assert _rows(spark, "q_dedup_clusters", sf_dir) == clusters
    assert _live(pair_df) and _live(cluster_df)

    release_memos()
    assert _rows(spark, "q_dedup_keep_policy_impact", sf_dir) == _rows(
        spark, "q_dedup_keep_policy_impact", sf_dir
    )
    assert _rows(spark, "q_dedup_ngram_jaccard", sf_dir) == first


def test_pair_stats_memo_is_thresholded(spark, sf_dir):
    """The stored pair table must contain ONLY pairs at or above the
    memo threshold — the compactness contract that keeps the snapshot
    bounded at corpus scale."""
    from pyspark.sql import functions as F

    import etl_pipeline_project_auraverse_spark.queries.dedup as dedup

    ps = dedup.capped_pair_stats(spark, sf_dir)
    jac = F.col("n_common") * 1.0 / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    assert ps.filter(jac < dedup.PAIR_MEMO_MIN_J).count() == 0
    assert ps.count() > 0


def test_superseded_snapshot_gc_bounds_warehouse(spark, tmp_path):
    """gc_memo_snapshots must delete app-id dirs from FINISHED sessions
    (stale > 1 h), keep the live application's dir, and keep
    fresh dirs that may belong to a concurrent session."""
    import os
    import time

    from etl_pipeline_project_auraverse_spark import cache as C

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh[len("file:"):] if wh.startswith("file:") else wh
    base = os.path.join(root.rstrip("/"), "memo_snapshots")
    app = spark.sparkContext.applicationId
    os.makedirs(os.path.join(base, app), exist_ok=True)
    stale = os.path.join(base, "local-0000000000001")
    fresh = os.path.join(base, "local-0000000000002")
    os.makedirs(stale, exist_ok=True)
    os.makedirs(fresh, exist_ok=True)
    old = time.time() - 7200
    os.utime(stale, (old, old))
    C._GC_SEEN.discard(app)  # the session fixture already swept once
    removed = C.gc_memo_snapshots(spark)
    assert "local-0000000000001" in removed
    assert not os.path.exists(stale)
    assert os.path.exists(fresh), "a <1h-old dir may belong to a live session"
    assert os.path.exists(os.path.join(base, app)), "never GC the live app dir"
    # once-per-application: a second call is a no-op even with stale dirs
    os.makedirs(stale, exist_ok=True)
    os.utime(stale, (old, old))
    assert C.gc_memo_snapshots(spark) == []
    os.rmdir(stale)
    os.rmdir(fresh)


def test_snapshot_gc_is_gated_on_owner_liveness(spark, tmp_path):
    """A >1h-stale dir whose _OWNER process is STILL RUNNING must
    survive the GC (a long parity session keeps re-reading snapshots it
    wrote in its first minutes), while a FRESH dir whose owner is gone
    is removed immediately — liveness, not age, decides."""
    import os
    import subprocess
    import sys
    import time

    from etl_pipeline_project_auraverse_spark import cache as C

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh[len("file:"):] if wh.startswith("file:") else wh
    base = os.path.join(root.rstrip("/"), "memo_snapshots")
    app = spark.sparkContext.applicationId

    live_owned = os.path.join(base, "local-0000000000011")
    dead_owned = os.path.join(base, "local-0000000000012")
    os.makedirs(live_owned, exist_ok=True)
    os.makedirs(dead_owned, exist_ok=True)
    # live owner: this very test process; dir made ancient on purpose
    with open(os.path.join(live_owned, C._OWNER_FILE), "w") as f:
        f.write(str(os.getpid()))
    old = time.time() - 7200
    os.utime(live_owned, (old, old))
    # dead owner: a child that has already exited (PID guaranteed dead
    # after wait); dir left FRESH on purpose
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    with open(os.path.join(dead_owned, C._OWNER_FILE), "w") as f:
        f.write(str(p.pid))

    C._GC_SEEN.discard(app)
    removed = C.gc_memo_snapshots(spark)
    assert "local-0000000000012" in removed, "dead-owner dir must go"
    assert not os.path.exists(dead_owned)
    assert os.path.exists(live_owned), (
        "a dir owned by a RUNNING process must survive however stale"
    )
    os.remove(os.path.join(live_owned, C._OWNER_FILE))
    os.rmdir(live_owned)


def test_memo_table_marks_owner(spark, sf_dir):
    """Any memo build/fetch must leave the app dir owner-marked so a
    concurrent session's GC can see this session is alive."""
    import os

    import etl_pipeline_project_auraverse_spark.queries.dedup as dedup
    from etl_pipeline_project_auraverse_spark import cache as C

    dedup.capped_pair_stats(spark, sf_dir)  # any memoized table works
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh[len("file:"):] if wh.startswith("file:") else wh
    app_dir = os.path.join(
        root.rstrip("/"), "memo_snapshots", spark.sparkContext.applicationId
    )
    marker = os.path.join(app_dir, C._OWNER_FILE)
    assert os.path.exists(marker)
    with open(marker) as f:
        parts = f.read().split()
    import socket

    assert int(parts[0]) == os.getpid()
    assert parts[1] == socket.gethostname()
    # on Linux the kernel start time must round-trip (PID-reuse guard)
    if len(parts) > 2:
        assert int(parts[2]) == C._proc_start_time(os.getpid())


def test_snapshot_gc_foreign_host_and_pid_reuse_get_age_grace(spark):
    """Owner files from ANOTHER HOST (whose PID liveness this host
    cannot probe) and recycled-PID owners (start-time mismatch) must
    fall back to the 1h mtime rule — fresh dirs survive, ancient ones
    go — never the immediate removal a provably-dead local owner gets."""
    import os
    import time

    from etl_pipeline_project_auraverse_spark import cache as C

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = wh[len("file:"):] if wh.startswith("file:") else wh
    base = os.path.join(root.rstrip("/"), "memo_snapshots")
    app = spark.sparkContext.applicationId

    old = time.time() - 7200
    dirs = {}
    # foreign-host owner, live-looking PID, FRESH dir -> keep
    # foreign-host owner, ANCIENT dir -> remove (mtime fallback)
    # recycled PID (this process's PID, wrong start time), ANCIENT -> remove
    specs = {
        "local-0000000000021": (f"{os.getpid()} other-host 123", None),
        "local-0000000000022": (f"{os.getpid()} other-host 123", old),
        "local-0000000000023": (f"{os.getpid()} {__import__('socket').gethostname()} 1", old),
    }
    for name, (owner, mtime) in specs.items():
        p = os.path.join(base, name)
        os.makedirs(p, exist_ok=True)
        with open(os.path.join(p, C._OWNER_FILE), "w") as f:
            f.write(owner)
        if mtime is not None:
            os.utime(p, (mtime, mtime))
        dirs[name] = p

    C._GC_SEEN.discard(app)
    removed = C.gc_memo_snapshots(spark)
    assert "local-0000000000021" not in removed and os.path.exists(
        dirs["local-0000000000021"]
    ), "fresh foreign-host dir must get the age grace"
    assert "local-0000000000022" in removed, "ancient foreign-host dir goes by age"
    if C._proc_start_time(os.getpid()) is not None:
        assert "local-0000000000023" in removed, (
            "ancient recycled-PID dir goes by age despite a live PID"
        )
    for p in dirs.values():
        if os.path.exists(p):
            os.remove(os.path.join(p, C._OWNER_FILE))
            os.rmdir(p)
