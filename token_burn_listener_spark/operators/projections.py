"""B2 — projections / filters / predicates (SURVEY.md §2.B2).

Reference parity: the listener's decode-and-project step (A4: pick
``returnValues.*`` fields) and source filter (A3: one contract address, one
topic) are exactly Spark ``select`` / ``filter``. Everything here is a
narrow, codegen-friendly Catalyst expression — no shuffles at all, so these
operators scale linearly with input splits at 100 TB.

Determinism note: per-row IEEE double arithmetic (mul/sub/add) is
bit-deterministic across engines, so projected arithmetic needs no rounding;
only multi-row aggregates do (see aggregations.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_proj_select",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS cust_name, c_mktsegment AS segment
    FROM customer
    """,
)
def q_proj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "q_proj_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def q_proj_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (TPC-H revenue expression)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (F.lit(1) + F.col("l_tax"))).alias("charged"),
    )


@query(
    "q_proj_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS price_band
    FROM orders
    """,
)
def q_proj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band"),
    )


@query(
    "q_proj_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec_str,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
)
def q_proj_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across the type lattice: double→decimal, int→string, ts→date."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec_str"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "q_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity >= 45.0 AND l_discount < 0.02 AND l_returnflag = 'A'
    """,
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """=, <, >= comparison predicates."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_quantity") >= 45.0)
            & (F.col("l_discount") < 0.02)
            & (F.col("l_returnflag") == "A")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@query(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_type, p_name FROM part
    WHERE p_type LIKE 'S%' AND p_name LIKE '%bolt%'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix and infix patterns."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type").like("S%") & F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_type", "p_name")
    )


@query(
    "q_filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range predicate on the ship date."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between("1996-01-01 00:00:00", "1996-12-31 23:59:59")
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "q_filter_null",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_or_null
    FROM lineitem
    WHERE NULLIF(l_discount, 0.0) IS NULL
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL handling (nullable column synthesized via nullif)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        li.select("l_orderkey", "l_linenumber", disc.alias("disc_or_null"))
        .filter(F.col("disc_or_null").isNull())
    )


@query(
    "q_filter_bool",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 400000)
      AND NOT o_orderpriority = '5-LOW'
    """,
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT combination."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 400000))
            & ~(F.col("o_orderpriority") == "5-LOW")
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "q_proj_nullsafe",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           GREATEST(o_totalprice, 100000.0) AS at_least_100k,
           LEAST(o_totalprice, 100000.0) AS at_most_100k,
           o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0) AS per_bucket
    FROM orders
    """,
)
def q_proj_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least / try_divide."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("at_most_100k"),
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 3).cast("double")
        ).alias("per_bucket"),
    )
