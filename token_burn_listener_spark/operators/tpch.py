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
from pyspark.sql.window import Window

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
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
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
                 / NULLIF(sum(l_extendedprice * (1 - l_discount)), 0), 4)
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
            # NULLIF (both engines): an all-zero-revenue slice zeroes the
            # denominator — Spark 4's ANSI mode THROWS on the division
            # where DuckDB yields NULL (the q_evt_pareto crash class);
            # the share is undefined there, so NULL on both
            F.round(
                100.0 * F.sum(promo) / F.nullif(F.sum(rev), F.lit(0.0)), 4
            ).alias("promo_revenue_pct")
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


# ---------------------------------------------------------------------------
# Round-3 completion: the remaining classic shapes (Q2/Q8/Q9/Q11/Q13/Q15/
# Q16/Q17/Q20/Q21/Q22 analogs). The fixture has no partsupp table, so the
# partsupp-bearing shapes (Q2/Q11/Q16/Q20) use lineitem as the part<->supplier
# relation — the plan shape (correlated min, scalar-subquery HAVING, NOT-IN
# exclusion, nested semi-join chain) is what carries over, per SURVEY.md §0.
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2ish",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS ck, l_suppkey AS sk,
             min(l_extendedprice) AS supply_cost
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT ck, min(supply_cost) AS min_cost FROM cost GROUP BY ck
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, supply_cost
    FROM cost
    JOIN best     ON cost.ck = best.ck AND cost.supply_cost = best.min_cost
    JOIN part     ON p_partkey = cost.ck
    JOIN supplier ON s_suppkey = cost.sk
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size BETWEEN 10 AND 14
    """,
)
def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier (no partsupp in the fixture:
    supply cost := min l_extendedprice observed per (part, supplier) from
    EUROPE-region suppliers).

    100 TB plan: the correlated min decorrelates into agg + self-equi-join
    on the part key, so the big relation shuffles on l_partkey once and the
    per-part min joins back WITHOUT a second shuffle (same partitioning).
    Region->nation collapse by broadcast HINT (25/5 rows at any SF); the
    supplier/part sides are SF-scaling, so their broadcast is AQE's
    runtime call, not a forced hint (an OOM cliff at scale) — before touching
    lineitem; the p_size filter prunes part scan-side. The min-equality
    join is exact: both sides compare the identical stored doubles.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    l = load_table(spark, sf_dir, "lineitem")
    cost = (
        l.join(s.select("s_suppkey"), l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    # Renamed join keys: best derives from cost, so same-name columns would
    # be flagged as an ambiguous self-join by the analyzer.
    best = (
        cost.select(F.col("l_partkey").alias("bk"), "supply_cost")
        .groupBy("bk")
        .agg(F.min("supply_cost").alias("min_cost"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size").between(10, 14))
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("bk"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .drop("bk", "min_cost")
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .join(
            s.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
            cost["l_suppkey"] == F.col("s_suppkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
    )


@query(
    "q_tpch_q8ish",
    oracle="""
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE 0 END)
                 / NULLIF(sum(vol), 0), 6) AS mkt_share
    FROM rev GROUP BY o_year
    """,
)
def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: one nation's slice of a
    region's yearly revenue, customer-side region filter + supplier-side
    nation tag.

    100 TB plan: both nation lookups and region are broadcasts; customer is
    the only mid-size dim and joins orders on its key before the fact join.
    The share is a ratio of two conditional sums in ONE aggregation pass
    over the joined fact — no second scan, no join of two aggregates.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("cn_key")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(s.select("s_suppkey", "s_nationkey"),
              l["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    national = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        # NULLIF (both engines): an all-zero-volume year zeroes the
        # denominator — Spark ANSI throws where DuckDB yields NULL; the
        # share is undefined there, so NULL on both
        .agg(
            F.round(
                F.sum(national) / F.nullif(F.sum(vol), F.lit(0.0)), 6
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q9ish",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, o_year
    """,
)
def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit by supplier nation and year
    (no ps_supplycost in the fixture — profit := discounted revenue).

    100 TB plan: the p_name LIKE filter prunes part BEFORE the fact join,
    and nation broadcasts by hint; the SF-scaling part/supplier sides
    broadcast only while AQE measures them small; orders⋈lineitem shuffles
    (on the order key). The group-by is low-cardinality (25 nations × ~7
    years), so partial aggregation collapses almost everything map-side.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(p.select("p_partkey"), l["l_partkey"] == F.col("p_partkey"))
        .join(s.select("s_suppkey", "s_nationkey"),
              l["l_suppkey"] == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("profit"))
    )


@query(
    "q_tpch_q11ish",
    oracle="""
    WITH val AS (
      SELECT l_partkey, sum(l_extendedprice) AS part_val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 13
      GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, round(part_val, 2) AS part_value
    FROM val
    WHERE part_val > (SELECT sum(part_val) * 0.0008 FROM val)
    """,
)
def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock identification (no partsupp:
    value := summed lineitem revenue per part from a nation band of
    suppliers), HAVING against a scalar subquery over the SAME aggregate.

    100 TB plan: the grouped relation is computed ONCE and reused for both
    the per-part rows and the global threshold (broadcast 1-row agg +
    crossJoin — never a driver collect); the supplier band joins by AQE's
    runtime choice (supplier scales with SF, so no forced-broadcast cliff)
    as a semi-filter before the shuffle. Threshold comparison is strict-> on a
    sum 1000× larger than any member — ulp-safe across engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    val = (
        l.join(s.select("s_suppkey"), l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_val"))
    )
    thr = val.agg((F.sum("part_val") * 0.0008).alias("_thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("part_val") > F.col("_thr"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round("part_val", 2).alias("part_value"),
        )
    )


@query(
    "q_tpch_q13ish",
    oracle="""
    WITH co AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist FROM co GROUP BY c_count
    """,
)
def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: outer join with
    a join-condition filter (NOT a post-filter — customers with zero
    qualifying orders must survive with count 0), then a second aggregation
    over the first.

    100 TB plan: the filtered outer join shuffles both sides on the
    customer key once; count(o_orderkey) ignores the null-extended rows.
    The second group-by runs over one row per customer with an integer
    key — partial aggregation collapses it to ~50 distinct counts.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    co = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q15ish",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the revenue "view" computed once,
    filtered to its own maximum via a scalar subquery.

    100 TB plan: one shuffle to group by supplier; the max is a broadcast
    1-row aggregate crossJoined back (the decorrelated form of the scalar
    subquery — no second pass over lineitem, no driver collect). Supplier
    is a broadcast dim. Within-engine max-equality is exact; rounding only
    on output.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
    )


@query(
    "q_tpch_q16ish",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier diversity per part attribute (no partsupp:
    lineitem is the part<->supplier relation; the negative-balance supplier
    set stands in for the complaints NOT IN exclusion).

    100 TB plan: the NOT IN becomes a broadcast LEFT ANTI join (the
    excluded set is tiny by construction); part's brand/size predicates
    prune scan-side before its broadcast. count(DISTINCT) shuffles on the
    group keys with the distinct key folded into the aggregation buffer —
    one exchange, no global distinct pre-pass.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    l = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        l.join(
            bad.select("s_suppkey"),
            l["l_suppkey"] == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17ish",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS ak, 0.5 * avg(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON ak = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < half_avg
    """,
)
def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: each lineitem
    compared against a per-part aggregate of the SAME table (correlated
    scalar avg, decorrelated into agg + self-join).

    100 TB plan: the self-join co-partitions on l_partkey — the aggregate
    reuses the fact's shuffle partitioning, so the decorrelated form costs
    one shuffle, not two. The brand filter broadcasts part and (at TPC-H
    selectivity, ~1/25) would justify semi-filtering the avg input too —
    kept full here to preserve the canonical decorrelation shape. The
    threshold is exact: quantities are integral, avg is the same double in
    both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    pavg = l.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    ).withColumnRenamed("l_partkey", "ak")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        l.join(p.select("p_partkey"), l["l_partkey"] == F.col("p_partkey"))
        .join(pavg, l["l_partkey"] == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q20ish",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey < 13
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 25
      )
    """,
)
def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped promotion-candidate suppliers (no partsupp: the
    availability test becomes "shipped >25 units of some small-family part
    this year"), a nested IN chain collapsing to semi joins.

    100 TB plan: innermost part-name filter broadcasts into lineitem; the
    HAVING aggregate shuffles on (suppkey, partkey); the outer IN is a
    LEFT SEMI join against the distinct supplier keys — semi joins never
    duplicate and stop at first match. Supplier's nation band is scan-side.
    """
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    heavy = (
        l.join(part.select("p_partkey"),
               l["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 25)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    return s.join(
        heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q_tpch_q21ish",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND s_nationkey < 13
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-supplier count (no commit/receipt dates:
    "kept the order waiting" := this supplier's line shipped LAST among a
    multi-supplier finished order) — EXISTS + NOT EXISTS on the same fact.

    100 TB plan: both correlated quantifiers fold into window aggregates
    over ONE l_orderkey exchange instead of semi/anti self-joins (which
    cost three corpus-sized sort-merge inputs — the r8 100× probe read
    factor 40 on the self-join form vs ~4 for this one). Exactness:
    EXISTS(other-supplier line) ⇔ min(suppkey)≠max(suppkey) over the
    order; NOT EXISTS(other-supplier line shipped later) ⇔ every
    later-shipped line is this supplier's own ⇔ n_gt_total == n_gt_own,
    where both counts come from RANGE frames ordered by shipdate (RANGE
    … CURRENT ROW includes all ties, so tie-breaks match the strict `>`
    of the quantifier on both engines). The (orderkey, suppkey) window
    reuses the orderkey hash partitioning (subset rule) — one exchange
    total; the F-order semi filter applies BEFORE the windows (the
    quantifiers are order-local, so restricting to F orders first is
    identity-preserving and shrinks the window input); supplier's nation
    band joins at the end, AQE-sized.
    """
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = l.join(o.select("o_orderkey"),
                   l["l_orderkey"] == F.col("o_orderkey"), "left_semi")
    w_ord = Window.partitionBy("l_orderkey")
    w_ord_le = w_ord.orderBy("l_shipdate").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_sup = Window.partitionBy("l_orderkey", "l_suppkey")
    w_sup_le = w_sup.orderBy("l_shipdate").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    waited = (
        lines.withColumn("n_gt_total",
                         F.count("*").over(w_ord) - F.count("*").over(w_ord_le))
        .withColumn("n_gt_own",
                    F.count("*").over(w_sup) - F.count("*").over(w_sup_le))
        .withColumn("multi_supp",
                    F.min("l_suppkey").over(w_ord) != F.max("l_suppkey").over(w_ord))
        .filter(F.col("multi_supp") & (F.col("n_gt_total") == F.col("n_gt_own")))
    )
    return (
        waited.join(s, waited["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q_tpch_q22ish",
    oracle="""
    WITH pos AS (
      SELECT avg(c_acctbal) AS abal FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey < 7
    )
    SELECT c_nationkey AS cntry, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, pos
    WHERE c_nationkey < 7
      AND c_acctbal > abal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped dormant-rich-customer rollup (nation-key band for
    the country-code prefix list; "no orders" tightened to "no orders
    since 2001" — every fixture customer has SOME order): scalar-subquery
    threshold + NOT EXISTS anti join.

    100 TB plan: the positive-balance average is a broadcast 1-row
    aggregate (one extra pass over the already-filtered customer slice);
    the NOT EXISTS is a shuffle LEFT ANTI against orders projected to its
    join key only (column pruning cuts the anti side to 8 bytes/row). The
    strict > against an averaged threshold sits far from any stored
    2-decimal value — ulp-safe cross-engine.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 7)
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
        .select("o_custkey")
    )
    abal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("abal")
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .crossJoin(F.broadcast(abal))
        .filter(F.col("c_acctbal") > F.col("abal"))
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
