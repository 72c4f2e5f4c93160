"""Subqueries — scalar, IN, correlated (extra, beyond SURVEY.md §2.B3).

EXISTS/NOT EXISTS are covered as semi/anti joins (joins.py); this module
exercises the remaining subquery shapes through the SQL entry point so
Catalyst's decorrelation rules (RewriteCorrelatedScalarSubquery,
RewritePredicateSubquery — SURVEY.md §4.2) run on real plans:

- scalar subquery → broadcast of a 1-row aggregate into the filter;
- IN subquery → left-semi join after rewrite;
- correlated scalar → decorrelated into an aggregate + outer join.

Scale notes: all three rewrite to joins against small aggregated sides —
nothing evaluates per-row Python or re-runs the inner query per outer row;
the decorrelated aggregate shuffles once on the correlation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import register_views


@query(
    "q_sub_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.75 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_sub_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 1.75× the mean price."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.75 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "q_sub_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
    """,
)
def q_sub_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery — rewritten by Catalyst into a left-semi join."""
    register_views(spark, sf_dir, names=("customer", "nation"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 2)
        """
    )


@query(
    "q_sub_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_sub_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each customer's orders 1.5× above their
    own average — decorrelated into a per-customer aggregate + join."""
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "q_tpch_q5ish",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue rollup (extra, §5.5 corpus
    shape): 6-way snowflake join — region/nation broadcast, fact joins
    keyed, one partial+final revenue aggregation per nation."""
    register_views(
        spark,
        sf_dir,
        names=("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    return spark.sql(
        """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        """
    )


@query(
    "q_tpch_q7ish",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey < 5
      AND sn.n_nationkey >= 20
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-nation volume (extra, §5.5 corpus shape):
    fact⋈fact keyed joins + two broadcast nation dims under different
    aliases + a yearly rollup. Nation bands are key ranges rather than the
    canonical FRANCE/GERMANY pair, which is empty at fixture scale."""
    register_views(
        spark, sf_dir, names=("lineitem", "orders", "customer", "supplier", "nation")
    )
    return spark.sql(
        """
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_nationkey < 5
          AND sn.n_nationkey >= 20
        GROUP BY 1, 2, 3
        """
    )


@query(
    "q_tpch_q10ish",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name
    ),
    top AS (SELECT * FROM r ORDER BY revenue DESC, c_custkey LIMIT 20)
    SELECT c_custkey, c_name, revenue,
           row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
    FROM top
    """,
)
def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item customer ranking (extra, §5.5):
    filtered fact join + per-customer revenue + TakeOrderedAndProject
    top-20 with the rank window applied after the limit."""
    register_views(spark, sf_dir, names=("customer", "orders", "lineitem"))
    return spark.sql(
        """
        WITH r AS (
          SELECT c_custkey, c_name,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
          GROUP BY c_custkey, c_name
        ),
        top AS (SELECT * FROM r ORDER BY revenue DESC, c_custkey LIMIT 20)
        SELECT c_custkey, c_name, revenue,
               row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
        FROM top
        """
    )
