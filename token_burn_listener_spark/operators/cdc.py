"""Change-data-capture shapes (round 3): snapshot diff and SCD Type 2.

The reference persists a mutable sink table (SURVEY.md §2.A A7); these are
the two batch operations a team runs against such a table's history: diff
two snapshots (what changed between loads) and rebuild a slowly-changing
dimension with validity intervals. Both snapshots are derived
deterministically in-query from `orders` (the fixture ships no real
snapshot pair), which keeps the oracle exact while preserving the plan
shape — the full-outer diff join and the window cascade are what matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_cdc_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS v
      FROM orders WHERE o_orderkey % 2 = 0
    ), new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT coalesce(old.k, new.k) AS k,
           CASE WHEN old.k IS NULL THEN 'insert'
                WHEN new.k IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           round(old.v, 2) AS old_v, round(new.v, 2) AS new_v
    FROM old FULL JOIN new ON old.k = new.k
    WHERE old.k IS NULL OR new.k IS NULL OR old.v <> new.v
    """,
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: full-outer join of two loads of the same keyed table,
    classifying every key as insert / delete / update and dropping the
    unchanged majority (the core of any batch CDC reconciliation).

    The two "snapshots" are deterministic in-query derivations of orders
    (key-modulus membership, value drift on every 10th key) — the fixture
    has no real snapshot pair, and deriving both sides keeps the oracle
    exact.

    100 TB plan: one full-outer sort-merge join on the uniform primary
    key — both snapshots shuffle once; the unchanged-row filter drops
    ~everything immediately after the join, so downstream sees only the
    delta (CDC output is delta-sized, not snapshot-sized). Equality on
    doubles is safe here: both engines compare the identical stored/shifted
    values.
    """
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v")
    )
    new = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("v"),
    )
    old_a, new_a = old.alias("old"), new.alias("new")
    j = old_a.join(new_a, F.col("old.k") == F.col("new.k"), "full")
    change = (
        F.when(F.col("old.k").isNull(), "insert")
        .when(F.col("new.k").isNull(), "delete")
        .otherwise("update")
    )
    return (
        j.filter(
            F.col("old.k").isNull()
            | F.col("new.k").isNull()
            | (F.col("old.v") != F.col("new.v"))
        )
        .select(
            F.coalesce(F.col("old.k"), F.col("new.k")).alias("k"),
            change.alias("change_type"),
            F.round(F.col("old.v"), 2).alias("old_v"),
            F.round(F.col("new.v"), 2).alias("new_v"),
        )
    )


@query(
    "q_cdc_scd2",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), runs AS (
      SELECT user_id, ts, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    ), versions AS (
      SELECT user_id, event_type, run_id::BIGINT AS version,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, version, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to,
           n_events
    FROM versions
    """,
)
def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 rebuild: collapse each user's event stream into
    versioned state rows — one row per run of consecutive equal
    event_type, with [valid_from, valid_to) validity intervals (valid_to
    NULL = current version). lag → change flag → running sum → run
    aggregation → lead: the full window cascade of a dimension rebuild.

    100 TB plan: every window and the aggregation partition by user_id,
    so ONE shuffle on the uniform user key serves the entire cascade
    (Catalyst keeps the child ordering; the lead over versions re-sorts
    only run-level rows, which are ≤ event rows). Per-user history is
    bounded — no skew, no single-task sort.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    versions = (
        e.withColumn("chg", chg)
        .withColumn("run_id", F.sum("chg").over(run).cast("long"))
        .groupBy("user_id", "event_type", F.col("run_id").alias("version"))
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    vw = Window.partitionBy("user_id").orderBy("version")
    return versions.select(
        "user_id",
        "event_type",
        "version",
        "valid_from",
        F.lead("valid_from").over(vw).alias("valid_to"),
        "n_events",
    )
