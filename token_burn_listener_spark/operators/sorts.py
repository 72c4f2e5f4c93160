"""B6 — sorts / limits / top-k (SURVEY.md §2.B6).

The driver's value-hash is order-insensitive, so sortedness is MATERIALIZED
as a row_number() rank column computed over the same ordering — the rank
values are what prove the sort (SURVEY.md §2.B6 note).

Scale notes: a global orderBy is a range-partitioned sort (sampled
boundaries, no single-task bottleneck); orderBy().limit(k) compiles to
TakeOrderedAndProject — per-partition top-k heaps, only k rows ever move —
the only sane global-sort shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.operators.ranking import global_row_number
from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, bal_or_null, c_mktsegment,
           row_number() OVER (
             ORDER BY bal_or_null DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
           ) AS sort_pos
    FROM (SELECT c_custkey, c_mktsegment,
                 CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
          FROM customer) t
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, mixed direction, NULLS LAST (nulls synthesized from
    negative balances); position materialized scale-safely: range-partition
    + local row_number + broadcast offsets (ranking.py), never a global
    single-task window.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_or_null"),
    )
    order = [
        F.col("bal_or_null").desc_nulls_last(),
        F.col("c_mktsegment").asc(),
        F.col("c_custkey").asc(),
    ]
    return global_row_number(c, order, "sort_pos").select(
        "c_custkey", "bal_or_null", "c_mktsegment", "sort_pos"
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_orderdate, arrival_pos
    FROM (SELECT o_orderkey, o_orderdate,
                 row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS arrival_pos
          FROM orders) t
    WHERE arrival_pos <= 100
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT after a deterministic (unique-key) sort — first 100 orders.

    limit-BEFORE-rank: orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition heaps, k rows shuffled); the rank window then runs on the
    100-row result instead of the full table (VERDICT.md r1 fix).
    """
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    top = o.select("o_orderkey", "o_orderdate").orderBy(*order).limit(100)
    return top.withColumn(
        "arrival_pos", F.row_number().over(Window.orderBy(*order))
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, price_rank
    FROM (SELECT o_orderkey, o_totalprice,
                 row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
          FROM orders) t
    WHERE price_rank <= 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price: orderBy(desc).limit(k) →
    TakeOrderedAndProject (heap per partition, only k rows move); rank
    window applied on the 10-row result (VERDICT.md r1 fix)."""
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    top = o.select("o_orderkey", "o_totalprice").orderBy(*order).limit(10)
    return top.withColumn("price_rank", F.row_number().over(Window.orderBy(*order)))
