"""B4 — aggregations (SURVEY.md §2.B4).

All aggregations are expressed as DataFrame ``groupBy().agg()`` so Catalyst
plans partial (map-side) + final HashAggregate pairs automatically — the
two-phase aggregation that makes these linear-scan-plus-small-shuffle at
100 TB. Nothing here ever collects to the driver.

Float policy (SURVEY.md §5.3): multi-row double sums depend on summation
order, which differs between engines and between partitionings — every
double aggregate is rounded in-query on BOTH sides (2dp for large sums,
6dp for averages/ratios whose magnitude keeps 6dp meaningful).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped global aggregate (count/sum/avg/min/max/distinct)."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the engine's flagship batch aggregate.

    Shape: scan→filter→partial agg→shuffle(6 groups)→final agg. At 100 TB
    the shuffle carries only num_groups × num_partitions rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expands to a two-level aggregate)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@query("q_agg_approx_distinct")  # rows-only: HLL sketches are engine-specific
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path where exact distinct
    would shuffle every key. rsd=0.01 keeps the estimate tight."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
    )


@query(
    "q_agg_sum_distinct",
    oracle="""
    SELECT l_returnflag,
           round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(DISTINCT ...) per group."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"))
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping() indicator flags."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL entry point."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        li=li,
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(array_agg(o_orderkey)), ',') AS order_keys
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list per group — sorted then joined to a string so the output
    is deterministic and hash-stable across engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("order_keys")
        )
    )


@query(
    "q_agg_stddev",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / variance per group."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        )
    )


@query(
    "q_agg_corr",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*)::DOUBLE AS n,
             sum(l_extendedprice) AS sx, sum(l_quantity) AS sy,
             sum(l_extendedprice * l_quantity) AS sxy,
             sum(l_extendedprice * l_extendedprice) AS sxx,
             sum(l_quantity * l_quantity) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((n * sxy - sx * sy)
                 / NULLIF(sqrt(greatest((n * sxx - sx * sx)
                                        * (n * syy - sy * sy), 0)), 0),
                 6) AS corr_price_qty,
           round((n * sxy - sx * sy) / NULLIF(n * (n - 1), 0), 2)
             AS covar_price_qty
    FROM s
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance aggregates, from raw moments on BOTH
    engines (not the builtins):

    - Spark's corr builtin THROWS under default ANSI mode on a
      zero-variance group (its final ck/sqrt(xMk*yMk) hits 0/0; found by
      the TPC-H fuzz on duplicate-row slices) while DuckDB's corr yields
      NULL.
    - The builtins also accumulate through engine-specific Welford
      routes, so a builtin-vs-anything pairing is only equal up to ulp —
      a latent round(·, 6) boundary flake. The shared six-sum formula
      (n·Sxy − Sx·Sy over the clamped variance product) makes both
      engines run the SAME op sequence: bit-identical on exact-sum
      (dyadic) fuzz data, ulp-equal-then-rounded on the fixture.
    - greatest(·, 0): near-zero variance can go fractionally negative
      from cancellation in float; clamp → sqrt(0) → NULLIF → NULL, the
      same undefined-corr answer, never a sqrt-of-negative.
    - NULLIF(n·(n−1), 0) gives covar_samp's n=1 NULL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("l_extendedprice").alias("sx"),
        F.sum("l_quantity").alias("sy"),
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("sxy"),
        F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias(
            "sxx"
        ),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.nullif(F.sqrt(F.greatest(vx * vy, F.lit(0.0))), F.lit(0.0))
    return g.select(
        "l_returnflag",
        F.round(num / den, 6).alias("corr_price_qty"),
        F.round(
            num / F.nullif(F.col("n") * (F.col("n") - 1), F.lit(0.0)), 2
        ).alias("covar_price_qty"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rb,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
               AS rw
      FROM orders)
    SELECT o_custkey,
           max(CASE WHEN rb = 1 THEN o_orderkey END) AS best_order,
           max(CASE WHEN rw = 1 THEN o_orderkey END) AS worst_order,
           round(max(o_totalprice), 2) AS best_price
    FROM ranked GROUP BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-min/arg-max aggregates with a DETERMINISTIC tie-break.

    r12: the orders fuzz corpus caught the latent flake the fixture's
    tie-free o_totalprice masked — on tied prices Spark's bare
    min_by/max_by picks whichever row its scan order meets first
    (partition-schedule dependent), so the same input could legally
    produce different winners run-to-run and diverge from any fixed
    oracle. The ordering key is now the (price, orderkey) STRUCT —
    lexicographic, total, and unique per row — so best = highest price
    then highest orderkey, worst = lowest price then lowest orderkey,
    on BOTH engines (the oracle spells it as row_number tie-breaks:
    DuckDB's arg_max only accepts scalar ordering keys).

    100 TB: still one hash aggregate with map-side partial min/max over
    a 16-byte struct — no window, no extra shuffle; determinism under
    ties is exactly what an at-scale pipeline needs for reproducible
    reruns on real (tie-bearing) data.
    """
    ord_key = F.struct("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("best_order"),
            F.min_by("o_orderkey", ord_key).alias("worst_order"),
            F.round(F.max("o_totalprice"), 2).alias("best_price"),
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           round(median(value), 6) AS med_value,
           round(quantile_cont(value, 0.9), 6) AS p90_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p90 (interpolated, matches DuckDB quantile_cont)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.median("value"), 6).alias("med_value"),
            F.round(F.percentile("value", 0.9), 6).alias("p90_value"),
        )
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
             AS discounted_revenue,
           count(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates (pivot-style wide metrics)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("discounted_revenue"),
            F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("n_bulk"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id % 10
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot a categorical column into count columns (explicit value list —
    at 100 TB an unbounded pivot would need a driver-side distinct first)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    df = (
        load_table(spark, sf_dir, "events")
        .withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", kinds)
        .count()
    )
    # Pivot yields NULL where a (bucket, type) pair is absent; the oracle's
    # FILTER form yields 0 — align on 0.
    return df.select(
        "user_bucket", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "q_agg_time_rollup",
    oracle="""
    SELECT date_trunc('hour', ts)::TIMESTAMP AS hour_start,
           event_type, count(*) AS n, round(sum(value), 6) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch hourly rollup of the event stream (extra, beyond §2.B4 — the
    batch twin of q_stream_tumbling, and the BASELINE.md 'events hourly
    tumbling rollup' shape for apples-to-apples bench comparison).

    date_trunc + hash agg: one partial+final aggregation, shuffle keyed on
    (hour, event_type) — the hypertable-rollup pattern at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


@query("q_agg_approx_percentile")  # rows-only: sketch internals are
# engine-specific (Spark KLL-style vs DuckDB t-digest); bounds checked here
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via quantile sketch (extra, beyond §2.B4).

    The sketch path for when exact percentile's full sort-per-group is too
    expensive at 100 TB: approx_percentile with bounded accuracy. Emits the
    approx values next to the group's true min/max so the rows-only check
    still has sanity anchors (approx must lie within [min, max]).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile_approx("value", 0.5, 10000), 6).alias("p50_approx"),
        F.round(F.percentile_approx("value", 0.9, 10000), 6).alias("p90_approx"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@query("q_agg_hll_union")  # rows-only: Apache DataSketches HLL binary
# sketches are Spark-specific (DuckDB has no compatible implementation);
# the estimate-vs-exact error bound is asserted in tests/test_contract.py
def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (extra, beyond §2.B4):
    per-(day, event_type) HLL sketches of user_id, union-merged up to
    per-type totals — the RE-AGGREGATABLE rollup pattern that makes
    count-distinct composable at 100 TB (approx_count_distinct collapses
    to a number; a stored SKETCH column can be re-merged across any
    dimension later without rescanning the fact table).

    Emits the daily-sketch count, the merged estimate, and the exact
    distinct alongside (the fixture is small enough) so the rows-only
    driver check carries its own sanity anchor; the ≤2 % error bound is
    pinned in tests.

    100 TB plan: sketches partial-aggregate map-side like any agg buffer
    (KB each, constant size regardless of cardinality); the union
    re-aggregation touches only (days × types) sketch rows — the fact is
    scanned once, ever, and every later rollup is sketch-sized work.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_daily_sketches"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
        .join(
            e.groupBy("event_type").agg(
                F.count_distinct("user_id").alias("exact_users")
            ),
            "event_type",
        )
    )


@query(
    "q_diag_join_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round(quantile_cont(cnt, 0.5), 6) AS p50_cnt,
           round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
           round(max(cnt) / avg(cnt), 6) AS skew_ratio
    FROM k
    """,
)
def q_diag_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (extra, beyond §2.B4): the per-key count
    distribution of a shuffle key (l_orderkey, the orders⋈lineitem join) —
    key cardinality, max/median/p99 per-key rows, and the max/avg skew
    ratio. This is the profiling query a team runs BEFORE choosing between
    plain SMJ, AQE skew splitting, and manual salting (q_join_salted):
    skew_ratio near 1 = uniform (shuffle freely), 100+ = salt or broadcast.

    100 TB plan: one partial+final count per key (map-side combine), then
    a second aggregation over the KEY table (cardinality-sized, not
    fact-sized) for the distribution stats — the diagnostic costs one
    shuffle of pre-aggregated counts, never a second fact scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return k.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.percentile("cnt", 0.5), 6).alias("p50_cnt"),
        F.round(F.percentile("cnt", 0.99), 6).alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_ratio"),
    )
