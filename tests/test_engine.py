"""Engine facade tests: SQL over registered views, registry queries,
profiling, and the ETL lifecycle all behind one object."""

from __future__ import annotations

from pathlib import Path

import pytest

from etl_pipeline_project_auraverse_spark.engine import Engine

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(sf_dir, spark=spark)


def test_sql_over_views(engine):
    df = engine.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_cust
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name ORDER BY n_cust DESC LIMIT 3
        """
    )
    rows = df.collect()
    assert len(rows) == 3
    assert rows[0]["n_cust"] >= rows[-1]["n_cust"]


def test_registry_query(engine):
    names = engine.queries()
    assert "q01_pricing_summary" in names and len(names) >= 60
    df = engine.query("q01_pricing_summary")
    assert df.collect()
    with pytest.raises(KeyError, match="unknown query"):
        engine.query("nope")


def test_profile_any_dataframe(engine):
    prof = engine.profile(engine.table("region"))
    by_name = {p["name"]: p for p in prof}
    assert by_name["r_regionkey"]["pk_candidate"] is True
    art = engine.schema_artifact(engine.table("region"))
    assert art["schema_id"].startswith("v") and len(art["fields"]) == 2


def test_run_etl_through_engine(engine, tmp_path):
    cfg = {
        "extract": {"type": "json", "source": str(FIXTURES / "simple.json"), "source_id": "eng"},
        "transform": {"drop_duplicates": True},
        "load": {"type": "csv", "destination": str(tmp_path / "out.csv")},
    }
    rep = engine.run_etl(cfg, schema_dir=str(tmp_path / "schemas"))
    # triple extraction (strict + {}-regex + []-regex) yields 6 rows;
    # dedup collapses the two tagged copies, keeping tagged + untagged
    assert rep.n_records == 4
    assert (tmp_path / "out.csv").exists()
