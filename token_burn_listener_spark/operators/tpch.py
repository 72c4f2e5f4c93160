"""TPC-H-shaped composite extras (SURVEY.md §5.5 corpus shapes, round 3).

Six more classic OLAP shapes beyond the Q1/Q3/Q5/Q7/Q10 analogs, written
with the DataFrame API (the q_tpch_q5ish trio demonstrates the SQL entry
point; these demonstrate the same plans composed programmatically). Each
docstring states the 100 TB plan property the shape exercises. Thresholds
and literals are adapted to the fixture schema (FIXTURES.md — no
l_shipmode/l_commitdate/p_container columns), keeping the canonical plan
shape: that is what matters for parity with the reconstructed SURVEY.md §2
inventory, since the reference checkout is empty (§0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


@query(
    "q_tpch_q4ish",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: correlated EXISTS as a
    LEFT SEMI join with a non-equi residual (l_shipdate > o_orderdate;
    the fixture has no commit/receipt dates).

    100 TB plan: the semi join never duplicates order rows no matter how
    many lineitems match, and the date filter on orders runs scan-side
    before the shuffle — both sides shuffle once on the order key.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    exists = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "q_tpch_q6ish",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue scan: pure filter + global agg,
    no joins — the canonical predicate-pushdown showcase.

    100 TB plan: all three predicates reach the parquet scan (PushedFilters;
    row-group min/max on l_shipdate skips most of a date-partitioned
    layout), the projection reads 4 of 11 columns, and the single global
    sum is a partial+final agg — one ~32-byte row per task crosses the
    exchange. Both engines compare the same stored doubles against the
    same literals, so the BETWEEN boundary is exact.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q12ish",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-priority pivot (l_returnflag stands in for
    the absent l_shipmode): fact⋈fact join + conditional counts.

    100 TB plan: lineitem is date-filtered scan-side before the shuffle;
    both facts shuffle once on the order key; the priority split is two
    conditional sums in ONE aggregation pass (no second scan, no pivot
    shuffle). Counts are exact integers — no float rounding in the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q14ish",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo-revenue share: dim join + ratio of two
    conditional sums in one pass.

    100 TB plan: part is a true dimension here (fixture: 2 k rows) and is
    auto-broadcast under the threshold; at TPC-H scale part is 1/5 of
    lineitem's row count, past broadcastability — the hint is deliberately
    omitted so AQE picks broadcast or SHJ from runtime stats. The ratio is
    computed from both sums in a single aggregation (one scan, one
    exchange); 4 dp rounding absorbs summation-order ulp noise.
    """
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@query(
    "q_tpch_q18ish",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-customer report: HAVING-filtered
    self-aggregation joined back to its parents.

    100 TB plan: the lineitem aggregation and the orders join share the
    order-key partitioning, so the agg output joins without a second
    shuffle of the big side; the HAVING filter collapses the fact to the
    rare heavy orders BEFORE any join. l_quantity is integral-valued, so
    the double sum and the >300 boundary are exact on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q_tpch_q19ish",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue (no p_container in
    the fixture; brand/size/quantity bands keep the OR-of-ANDs shape).

    100 TB plan: the disjunction straddles both tables, so it can only be
    applied post-join — but Catalyst derives the single-table implications
    (l_quantity BETWEEN 1 AND 30, p_brand IN (...)) and pushes THOSE to
    the scans, which is the part that prunes row groups at scale. The
    join side stays a small broadcast locally; at scale the residual OR
    evaluates inside whole-stage codegen, never a UDF.
    """
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .filter(band)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
