"""Round-trip tests for the native tabular readers/writers, including
partition pruning through directory-partitioned layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.session import load_table
from etl_pipeline_project_auraverse_spark.sources import tabular


def test_format_routing():
    assert tabular.format_for_path("a/b/data.CSV") == "csv"
    assert tabular.format_for_path("x.jsonl") == "json"
    assert tabular.format_for_path("x.parquet") == "parquet"
    assert tabular.format_for_path("notes.md") == "text"
    with pytest.raises(ValueError, match="Unsupported file type"):
        tabular.format_for_path("archive.zip")


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    tabular.write_partitioned(src, path, fmt="csv")
    back = tabular.read_csv_table(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(back.collect()) == sorted(src.collect())


def test_json_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    tabular.write_partitioned(src, path, fmt="json")
    back = tabular.read_json_table(spark, path).select("r_regionkey", "r_name")
    assert sorted(back.collect()) == sorted(src.collect())


def test_partitioned_write_enables_partition_pruning(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    tabular.write_partitioned(src, path, fmt="parquet", partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the status filter must land in PartitionFilters (pruned dirs),
    # not as a data filter over a full scan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "o_orderstatus" in pf
    n_f = src.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == n_f


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    assert tabular.format_for_path("x.orc") == "orc"
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    tabular.write_partitioned(src, path, fmt="orc")
    back = spark.read.orc(path)
    assert sorted(back.collect()) == sorted(src.collect())
    filtered = back.filter(F.col("n_nationkey") < 5)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "n_nationkey" in pushed


def test_json_corrupt_records_surfaced(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"id": 1, "v": "a"}\nTHIS IS NOT JSON\n{"id": 2, "v": "b"}\n')
    df = tabular.read_json_table(
        spark, str(p), schema="id bigint, v string", keep_corrupt=True
    )
    rows = df.collect()
    good = sorted((r["id"], r["v"]) for r in rows if r["_corrupt_record"] is None)
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == [(1, "a"), (2, "b")]
    assert bad == ["THIS IS NOT JSON"]
    with pytest.raises(ValueError, match="explicit schema"):
        tabular.read_json_table(spark, str(p), keep_corrupt=True)


def test_compressed_extension_routes_and_reads(spark, tmp_path):
    """data.jsonl.gz routes as json and reads through Spark's native
    per-file decompression."""
    import gzip

    assert tabular.format_for_path("a/b/data.jsonl.gz") == "json"
    assert tabular.format_for_path("x.csv.bz2") == "csv"
    assert tabular.format_for_path("notes.TXT.GZ") == "text"
    with pytest.raises(ValueError):
        tabular.format_for_path("archive.tar.gz")  # .tar is not a table

    path = str(tmp_path / "rows.jsonl.gz")
    with gzip.open(path, "wt") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    got = tabular.read_table(spark, path)
    assert {(r["a"], r["b"]) for r in got.collect()} == {(1, "x"), (2, "y")}


def test_tsv_routes_with_tab_separator(spark, tmp_path):
    path = str(tmp_path / "rows.tsv")
    with open(path, "w") as f:
        f.write("a\tb\n1\tx\n2\ty\n")
    got = tabular.read_table(spark, path)
    assert {(r["a"], r["b"]) for r in got.collect()} == {(1, "x"), (2, "y")}


def test_xml_table_roundtrip(spark, tmp_path):
    """XML route: row elements -> union-of-keys table with attributes,
    nested elements, repeated tags, and the malformed-file sentinel."""
    from etl_pipeline_project_auraverse_spark.sources.tabular import read_table

    good = tmp_path / "data.xml"
    good.write_text(
        """<rows>
          <row id="1"><name>alice</name><score>9</score>
            <tag>a</tag><tag>b</tag></row>
          <row id="2"><name>bob</name>
            <addr><city>ber</city></addr></row>
        </rows>"""
    )
    df = read_table(spark, str(good))
    rows = {r["@id"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"]["name"] == "alice"
    assert rows["1"]["score"] == "9"
    assert rows["1"]["tag"] == ["a", "b"]
    assert rows["2"]["addr"]["city"] == "ber"
    assert rows["2"]["score"] is None  # union-of-keys null fill

    bad = tmp_path / "broken.xml"
    bad.write_text("<rows><row>unclosed")
    err = read_table(spark, str(bad))
    assert err.columns == ["_error"]
    assert "xml_parse" in err.collect()[0]["_error"]


def test_xml_roundtrip_property(spark, tmp_path):
    """Property: any flat string table serialized as XML reads back
    with identical values (hypothesis-generated shapes, including
    heterogeneous per-row keys)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_pipeline_project_auraverse_spark.sources.xml_table import read_xml_table

    key = st.sampled_from(["alpha", "beta", "gamma", "delta"])
    val = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Nd")), min_size=1, max_size=8
    )
    rows_st = st.lists(
        st.dictionaries(key, val, min_size=1, max_size=4), min_size=1, max_size=6
    )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_st)
    def check(rows):
        import uuid as _uuid

        p = tmp_path / f"{_uuid.uuid4().hex}.xml"
        body = "".join(
            "<row>" + "".join(f"<{k}>{v}</{k}>" for k, v in r.items()) + "</row>"
            for r in rows
        )
        p.write_text(f"<root>{body}</root>")
        got = [r.asDict() for r in read_xml_table(spark, str(p)).collect()]
        want = [
            {k: r.get(k) for k in sorted({k for r in rows for k in r})}
            for r in rows
        ]
        canon = lambda rs: sorted(  # noqa: E731
            [tuple(sorted((k, v) for k, v in r.items() if v is not None)) for r in rs]
        )
        assert canon(got) == canon(want)

    check()
