"""B5 — window functions (SURVEY.md §2.B5).

Windows shuffle once on partitionBy keys, then sort within partitions —
at 100 TB the key choice is the scale lever: per-customer / per-user
partitions are small and uniform here; a global-ORDER-BY window (no
partitionBy) serializes onto one task and appears only in bounded top-k
shapes (see sorts.py q_topk_global, which uses TakeOrderedAndProject
instead).

Determinism: every orderBy carries a unique tiebreaker key (verified tie
hazards in the fixtures: o_orderdate ties within customer exist). Running
double sums are rounded per-row on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
    with_total_count,
)
from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def q_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition sequence numbers (unique tiebreaker on o_orderkey)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("order_seq")
    )


@query(
    "q_win_rank",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS qty_rank,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS qty_dense_rank
    FROM lineitem
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a deliberately tie-heavy key (l_quantity has ~50
    distinct values) — tie semantics themselves are what is verified."""
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("qty_rank"),
        F.dense_rank().over(w).alias("qty_dense_rank"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quartile
    FROM customer
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment (tiebreak on c_custkey: one acctbal tie exists).

    Scale-safe: NTILE derived from the range-partitioned global rank + total
    count (ranking.py) instead of a single-task global window.
    """
    c = load_table(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    ranked = with_total_count(global_row_number(c, order, "_rnk"))
    return ranked.select(
        "c_custkey",
        ntile_from_rank(F.col("_rnk"), F.col("_n"), 4).alias("bal_quartile"),
    )


@query(
    "q_win_pct",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_pct_rank,
           round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 6) AS bal_cume_dist
    FROM customer
    """,
)
def q_win_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (ratio outputs rounded 6dp).

    Scale-safe: under the total order (unique c_custkey tiebreaker) both
    reduce to closed forms of the global rank — percent_rank = (r-1)/(n-1),
    cume_dist = r/n — computed via ranking.py, no global window.
    """
    c = load_table(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    ranked = with_total_count(global_row_number(c, order, "_rnk"))
    r, n = F.col("_rnk"), F.col("_n")
    # n == 1 guard: percent_rank() is defined as 0.0 for a single-row
    # input, where the closed form (r-1)/(n-1) would divide by zero.
    pct = F.when(n == 1, F.lit(0.0)).otherwise((r - 1) / (n - 1))
    return ranked.select(
        "c_custkey",
        F.round(pct, 6).alias("bal_pct_rank"),
        F.round(r / n, 6).alias("bal_cume_dist"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value per user in event-time order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@query(
    "q_win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (prefix) sum per customer — cumulative revenue."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, day_no,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY day_no
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS day_no
          FROM orders) t
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a day-number key: trailing-30-day spend per customer.

    RANGE (value-based) frames include ALL rows within the key distance —
    including orderdate ties — unlike ROWS frames, which is the semantics
    difference this key exercises.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day_no",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "q_win_sliding",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3
    FROM events
    """,
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("moving_avg3"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over the full partition frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "q_win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, order_rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS order_rank
          FROM orders) t
    WHERE order_rank <= 3
    """,
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark ≥3.5 rewrites rank<=k filters into
    WindowGroupLimit — per-partition partial top-k before the shuffle —
    which is exactly the at-scale plan you want."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "order_rank")
    )
