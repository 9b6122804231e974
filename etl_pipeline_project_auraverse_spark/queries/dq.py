"""Data-quality expectation suite over the star schema.

The validation pass an ETL pipeline runs before publishing a load:
column completeness, key uniqueness, value bounds, accepted domains,
and referential integrity — all metrics from ``operators/dq.py``,
where same-table checks compile into ONE aggregate scan and the RI
check is an anti-join count. The report is the contract: one
``(constraint_name, metric, passed)`` row per expectation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

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
from etl_pipeline_project_auraverse_spark.queries import register
from etl_pipeline_project_auraverse_spark.session import load_table

_STATUS = ["O", "F", "P"]
_PRICE_MAX = 1.0e7


@register(
    "q_dq_orders_report",
    oracle=f"""
    WITH base AS (
        SELECT COUNT(*) AS n,
               COUNT(o_custkey) AS nc,
               COUNT(DISTINCT o_orderkey) AS nd,
               MIN(o_totalprice) AS mn,
               MAX(o_totalprice) AS mx,
               COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 END)
                   + COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS bad
        FROM orders
    ),
    orph AS (
        SELECT COUNT(*) AS k
        FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT * FROM (
        SELECT 'row_count>0' AS constraint_name,
               CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM base
        UNION ALL
        SELECT 'completeness(o_custkey)',
               CAST(ROUND(nc / n, 6) AS DOUBLE), ROUND(nc / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'uniqueness(o_orderkey)',
               CAST(ROUND(nd / n, 6) AS DOUBLE), ROUND(nd / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'min(o_totalprice)>=0.0',
               CAST(ROUND(mn, 6) AS DOUBLE), ROUND(mn, 6) >= 0.0 FROM base
        UNION ALL
        SELECT 'max(o_totalprice)<={_PRICE_MAX}',
               CAST(ROUND(mx, 6) AS DOUBLE), ROUND(mx, 6) <= {_PRICE_MAX}
        FROM base
        UNION ALL
        SELECT 'accepted_values(o_orderstatus)',
               CAST(bad AS DOUBLE), bad = 0 FROM base
        UNION ALL
        SELECT 'referential(o_custkey)',
               CAST(k AS DOUBLE), k = 0 FROM orph
    )
    ORDER BY constraint_name
    """,
)
def q_dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite for the orders load: six single-scan checks
    plus customer referential integrity, one report row each."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    checks = [
        non_empty(),
        completeness("o_custkey"),
        uniqueness("o_orderkey"),
        min_bound("o_totalprice", 0.0),
        max_bound("o_totalprice", _PRICE_MAX),
        accepted_values("o_orderstatus", _STATUS),
    ]
    report = dq_report(orders, checks)
    ri = referential_integrity(orders, "o_custkey", customer, "c_custkey")
    return report.unionByName(ri).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# Lineitem expectation suite: exercises the rule types the orders
# report doesn't — compound-key uniqueness, cross-field business
# rules (predicate checks), and TWO referential-integrity edges. The
# 0.15 discount+tax ceiling intentionally FAILS on the generated data
# (~3% of rows exceed it) so the report attests failing rows and
# nonzero metrics, not just a wall of greens.
# ---------------------------------------------------------------------------
_DT_LIMIT = 0.15
_SHIP_LO, _SHIP_HI = "1995-01-01", "2002-12-31"


@register(
    "q_dq_lineitem_report",
    oracle=f"""
    WITH base AS (
        SELECT COUNT(*) AS n,
               COUNT(l_partkey) AS np,
               (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
                                      FROM lineitem)) AS nd,
               MIN(l_quantity) AS qmin,
               MAX(l_discount) AS dmax,
               COUNT(CASE WHEN NOT COALESCE(l_discount + l_tax <= {_DT_LIMIT},
                                            FALSE) THEN 1 END) AS dt_bad,
               COUNT(CASE WHEN NOT COALESCE(
                   l_shipdate >= DATE '{_SHIP_LO}'
                   AND l_shipdate < DATE '{_SHIP_HI}', FALSE) THEN 1 END)
                   AS ship_bad
        FROM lineitem
    ),
    orph_o AS (
        SELECT COUNT(*) AS k
        FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    orph_p AS (
        SELECT COUNT(*) AS k
        FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT * FROM (
        SELECT 'row_count>0' AS constraint_name,
               CAST(n AS DOUBLE) AS metric, n > 0 AS passed FROM base
        UNION ALL
        SELECT 'completeness(l_partkey)',
               CAST(ROUND(np / n, 6) AS DOUBLE), ROUND(np / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'uniqueness(l_orderkey,l_linenumber)',
               CAST(ROUND(nd / n, 6) AS DOUBLE), ROUND(nd / n, 6) >= 1.0
        FROM base
        UNION ALL
        SELECT 'min(l_quantity)>=1.0',
               CAST(ROUND(qmin, 6) AS DOUBLE), ROUND(qmin, 6) >= 1.0 FROM base
        UNION ALL
        SELECT 'max(l_discount)<=0.5',
               CAST(ROUND(dmax, 6) AS DOUBLE), ROUND(dmax, 6) <= 0.5 FROM base
        UNION ALL
        SELECT 'predicate(discount_tax_sum<={_DT_LIMIT})',
               CAST(dt_bad AS DOUBLE), dt_bad = 0 FROM base
        UNION ALL
        SELECT 'predicate(shipdate_in_range)',
               CAST(ship_bad AS DOUBLE), ship_bad = 0 FROM base
        UNION ALL
        SELECT 'referential(l_orderkey)',
               CAST(k AS DOUBLE), k = 0 FROM orph_o
        UNION ALL
        SELECT 'referential(l_partkey)',
               CAST(k AS DOUBLE), k = 0 FROM orph_p
    )
    ORDER BY constraint_name
    """,
)
def q_dq_lineitem_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite for the lineitem load: seven single-scan
    checks (incl. compound-key uniqueness and two cross-field
    predicates) plus orders and part referential integrity."""
    from etl_pipeline_project_auraverse_spark.operators.dq import (
        predicate_holds,
        uniqueness_multi,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    checks = [
        non_empty(),
        completeness("l_partkey"),
        uniqueness_multi(["l_orderkey", "l_linenumber"]),
        min_bound("l_quantity", 1.0),
        max_bound("l_discount", 0.5),
        predicate_holds(
            f"discount_tax_sum<={_DT_LIMIT}",
            F.col("l_discount") + F.col("l_tax") <= _DT_LIMIT,
        ),
        predicate_holds(
            "shipdate_in_range",
            (F.col("l_shipdate") >= F.lit(_SHIP_LO).cast("date"))
            & (F.col("l_shipdate") < F.lit(_SHIP_HI).cast("date")),
        ),
    ]
    report = dq_report(li, checks)
    ri_o = referential_integrity(li, "l_orderkey", orders, "o_orderkey")
    ri_p = referential_integrity(li, "l_partkey", part, "p_partkey")
    return (
        report.unionByName(ri_o).unionByName(ri_p).orderBy("constraint_name")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit: group the customer dim by its quasi-identifiers
# (nation, market segment, coarse balance bucket) and report the
# equivalence-class-size distribution plus, per size, whether those
# rows would be re-identifiable under the common k=5 policy. The
# privacy-risk readout that decides which quasi-identifier needs
# further generalization before a dataset ships — the audit face of
# the PII-scrub family (functions/pii.py redacts direct identifiers;
# this measures indirect ones).
#
# Scale posture: one groupBy on the quasi-identifier tuple (map-side
# partial counts), then a groupBy on the bounded class-size key —
# two shuffles, both combiner-friendly, no joins.
# ---------------------------------------------------------------------------
KANON_K = 5
_KANON_BUCKET = 1000.0


@register(
    "q_kanonymity_customer",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / {_KANON_BUCKET}) AS BIGINT) AS bal_bucket,
               COUNT(*) AS class_size
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT class_size,
           COUNT(*) AS n_classes,
           CAST(class_size * COUNT(*) AS BIGINT) AS n_rows,
           (class_size < {KANON_K}) AS below_k
    FROM classes
    GROUP BY class_size
    ORDER BY class_size
    """,
)
def q_kanonymity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class-size histogram over the customer
    quasi-identifiers (nation, segment, balance bucket) with the
    k={KANON_K} re-identification flag."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / _KANON_BUCKET).cast("long").alias(
            "bal_bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(F.count(F.lit(1)).alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") * F.col("n_classes"))
            .cast("long")
            .alias("n_rows"),
            (F.col("class_size") < KANON_K).alias("below_k"),
        )
        .orderBy("class_size")
    )


L_DIVERSITY = 3


@register(
    "q_ldiversity_order_priority",
    oracle=f"""
    WITH joined AS (
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS sensitive
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), per_sv AS (
        SELECT c_nationkey, c_mktsegment, sensitive, COUNT(*) AS cnt
        FROM joined GROUP BY 1, 2, 3
    ), shares AS (
        SELECT c_nationkey, c_mktsegment, cnt,
               cnt * 1.0 / SUM(cnt) OVER (
                   PARTITION BY c_nationkey, c_mktsegment) AS p
        FROM per_sv
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS distinct_l,
           CAST(ROUND(EXP(CAST(SUM(CAST(ROUND(-p * LN(p), 6)
                AS DECIMAL(25,6))) AS DOUBLE)), 4) AS DOUBLE) AS entropy_l,
           (COUNT(*) >= {L_DIVERSITY}) AS meets_l
    FROM shares
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q_ldiversity_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: for each quasi-identifier class (nation,
    segment), how many DISTINCT sensitive values (order priority)
    appear, plus entropy l-diversity exp(H) — the privacy check that
    k-anonymity alone misses (a class can be large yet reveal its
    sensitive value if every row agrees).

    Plan: one equi-join on custkey, one aggregate to (class, sensitive)
    counts (the QI-class domain is small; the groupBy's partial
    aggregation collapses rows map-side), then a class-partitioned
    window for the within-class shares and a final class aggregate.
    The -p*ln(p) terms round to 6dp before DECIMAL accumulation (the
    ln-determinism idiom).
    """
    from etl_pipeline_project_auraverse_spark.queries._util import DEC

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    per_sv = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("sensitive"))
        .agg(F.count("*").alias("cnt"))
    )
    wcls = W.partitionBy("c_nationkey", "c_mktsegment")
    p = F.col("cnt") * 1.0 / F.sum("cnt").over(wcls)
    terms = per_sv.withColumn("h_term", F.round(-p * F.log(p), 6).cast(DEC))
    return (
        terms.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("distinct_l"),
            F.round(F.exp(F.sum("h_term").cast("double")), 4)
            .cast("double")
            .alias("entropy_l"),
            (F.count("*") >= L_DIVERSITY).alias("meets_l"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit: for each declared candidate FD
# lhs -> rhs, how many lhs values map to MORE than one rhs value (and
# how badly). The profiling primitive behind key discovery and
# denormalization checks; each FD is one groupBy(lhs) with a distinct
# count — at 100 TB, one shuffle per audited dependency, map-side
# partials doing most of the work. The battery includes a true key
# (p_partkey -> p_brand: zero violations by construction) so a green
# row attests the zero path too, not just the violating ones.
# ---------------------------------------------------------------------------
_FDS = [  # (fd_name, table, lhs, rhs)
    ("part.p_partkey->p_brand", "part", "p_partkey", "p_brand"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey",
     "c_mktsegment"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey",
     "o_orderpriority"),
]


def _fd_oracle() -> str:
    arms = []
    for name, table, lhs, rhs in _FDS:
        arms.append(f"""
    SELECT '{name}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(COUNT(CASE WHEN k > 1 THEN 1 END) AS BIGINT)
               AS n_violating_lhs,
           CAST(MAX(k) AS BIGINT) AS max_rhs_variants,
           CAST(COUNT(CASE WHEN k > 1 THEN 1 END) * 1000000 // COUNT(*)
                AS BIGINT) AS violation_ppm
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS k FROM {table}
          GROUP BY {lhs})""")
    arms_sql = " UNION ALL ".join(arms)
    return f"SELECT * FROM ({arms_sql}) ORDER BY fd"


@register("q_fd_violation_audit", oracle=_fd_oracle())
def q_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation census for three declared candidate functional
    dependencies (one true key, two violated attributes): per FD the
    lhs cardinality, violating-lhs count, worst rhs fan-out, and the
    integer ppm violation share."""
    out = None
    for name, table, lhs, rhs in _FDS:
        k = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("k"))
        )
        row = k.agg(
            F.count("*").alias("n_lhs"),
            F.count(F.when(F.col("k") > 1, 1)).alias("n_violating_lhs"),
            F.max("k").alias("max_rhs_variants"),
        ).select(
            F.lit(name).alias("fd"),
            F.col("n_lhs").cast("long"),
            F.col("n_violating_lhs").cast("long"),
            F.col("max_rhs_variants").cast("long"),
            F.expr("n_violating_lhs * 1000000 div n_lhs")
            .cast("long")
            .alias("violation_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")
