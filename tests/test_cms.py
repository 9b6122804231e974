"""Count-min sketch operator tests: the CMS guarantee must hold for
BOTH hash engines (estimate >= exact always; bounded mean overcount),
and the md5 arm must stay plan-identical to the oracle-checked query
path (that parity is covered by test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.cms import (
    cms_build,
    cms_probe,
)

D, W = 4, 512


def _zipf_df(spark, n_keys=300, rows=6000):
    # deterministic zipf-ish: key k appears ~ rows/(k+1) times
    vals = []
    k = 0
    while len(vals) < rows:
        vals.extend([k] * max(1, rows // (2 * (k + 1))))
        k = (k + 1) % n_keys
    return spark.createDataFrame([(v,) for v in vals[:rows]], "key long")


@pytest.mark.parametrize("engine", ["xxhash64", "md5"])
def test_cms_never_undercounts_and_overcount_bounded(spark, engine):
    df = _zipf_df(spark)
    n_total = df.count()
    sketch = cms_build(df, "key", D, W, engine=engine)
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_probe(sketch, exact, "key", D, W, engine=engine).collect()
    assert est, "no estimates produced"
    over = [r["cms_estimate"] - r["n_exact"] for r in est]
    assert min(over) >= 0, "CMS undercounted — impossible for a correct sketch"
    # e/W * N is the standard eps*N bound; the MEAN overcount should
    # sit far below it for a sane hash family
    assert sum(over) / len(over) <= 2.72 / W * n_total

def test_cms_sketch_is_bounded_rows(spark):
    df = _zipf_df(spark)
    assert cms_build(df, "key", D, W).count() <= D * W


def test_engines_agree_on_heavy_hitters(spark):
    # both engines must rank the same top keys (estimates differ,
    # heavy-hitter identification must not)
    df = _zipf_df(spark)
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    tops = {}
    for engine in ("xxhash64", "md5"):
        sketch = cms_build(df, "key", D, W, engine=engine)
        est = cms_probe(sketch, exact, "key", D, W, engine=engine)
        tops[engine] = [
            r["key"]
            for r in est.orderBy(F.desc("cms_estimate"), "key").limit(5).collect()
        ]
    assert tops["xxhash64"] == tops["md5"]


@pytest.mark.parametrize("engine", ["xxhash64", "md5"])
def test_weighted_build_matches_raw_build(spark, engine):
    # building from the (key, count) histogram must produce the exact
    # same sketch as building from the raw observation rows
    df = _zipf_df(spark)
    hist = df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    raw = {
        (r["d"], r["bucket"]): r["c"]
        for r in cms_build(df, "key", D, W, engine=engine).collect()
    }
    weighted = {
        (r["d"], r["bucket"]): r["c"]
        for r in cms_build(
            hist, "key", D, W, engine=engine, weight_col="n"
        ).collect()
    }
    assert raw == weighted


def test_unknown_engine_rejected(spark):
    df = _zipf_df(spark, rows=10)
    with pytest.raises(ValueError, match="unknown CMS hash engine"):
        cms_build(df, "key", D, W, engine="sha1")
