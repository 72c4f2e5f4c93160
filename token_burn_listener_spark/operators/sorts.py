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
    negative balances); position materialized via row_number."""
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
    return c.select(
        "c_custkey",
        "bal_or_null",
        "c_mktsegment",
        F.row_number().over(Window.orderBy(*order)).alias("sort_pos"),
    ).orderBy(*order)


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
    """LIMIT after a deterministic (unique-key) sort — first 100 orders."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("arrival_pos"),
        )
        .orderBy("arrival_pos")
        .limit(100)
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
    TakeOrderedAndProject (heap per partition, k rows shuffled)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
