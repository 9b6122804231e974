"""DQ expectation suite: metrics and pass/fail on a dirty frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.operators.dq import (
    accepted_values,
    completeness,
    dq_report,
    max_bound,
    min_bound,
    non_empty,
    referential_integrity,
    uniqueness,
)


def test_dirty_frame_fails_the_right_checks(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (1, "O", -5.0), (None, "X", 20.0), (3, None, 99.0)],
        "k: long, status: string, price: double",
    )
    rows = {
        r["constraint_name"]: (r["metric"], r["passed"])
        for r in dq_report(
            df,
            [
                non_empty(),
                completeness("k"),
                uniqueness("k"),
                min_bound("price", 0.0),
                max_bound("price", 50.0),
                accepted_values("status", ["O", "F"]),
            ],
        ).collect()
    }
    assert rows["row_count>0"] == (4.0, True)
    assert rows["completeness(k)"] == (0.75, False)
    # 2 distinct non-null keys over 4 rows
    assert rows["uniqueness(k)"] == (0.5, False)
    assert rows["min(price)>=0.0"] == (-5.0, False)
    assert rows["max(price)<=50.0"] == (99.0, False)
    # 'X' is out of domain and one status is NULL -> 2 violations
    assert rows["accepted_values(status)"] == (2.0, False)


def test_clean_frame_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0)], "k: long, status: string, price: double"
    )
    report = dq_report(
        df,
        [
            non_empty(),
            completeness("k"),
            uniqueness("k"),
            min_bound("price", 0.0),
            max_bound("price", 50.0),
            accepted_values("status", ["O", "F"]),
        ],
    )
    assert all(r["passed"] for r in report.collect())


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk: long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: long")
    row = referential_integrity(child, "fk", parent, "pk").first()
    assert row["constraint_name"] == "referential(fk)"
    assert (row["metric"], row["passed"]) == (2.0, False)


def test_compound_uniqueness_and_predicates(spark):
    from etl_pipeline_project_auraverse_spark.operators.dq import (
        dq_report,
        predicate_holds,
        uniqueness_multi,
    )

    df = spark.createDataFrame(
        [(1, 1, 5.0, 2.0), (1, 2, 3.0, 4.0), (1, 2, 1.0, None)],
        "a long, b long, lo double, hi double",
    )
    rows = {
        r["constraint_name"]: r
        for r in dq_report(
            df,
            [
                uniqueness_multi(["a", "b"]),
                predicate_holds("lo<=hi", F.col("lo") <= F.col("hi")),
            ],
        ).collect()
    }
    u = rows["uniqueness(a,b)"]
    assert not u["passed"] and abs(u["metric"] - round(2 / 3, 6)) < 1e-9
    p = rows["predicate(lo<=hi)"]
    # row 1 violates (5 > 2), row 3's null comparison is a violation
    assert not p["passed"] and p["metric"] == 2.0


def test_predicate_all_pass(spark):
    from etl_pipeline_project_auraverse_spark.operators.dq import (
        dq_report,
        predicate_holds,
    )

    df = spark.createDataFrame([(1.0, 2.0), (0.0, 0.0)], "x double, y double")
    row = dq_report(df, [predicate_holds("x<=y", F.col("x") <= F.col("y"))]).collect()[0]
    assert row["passed"] and row["metric"] == 0.0
