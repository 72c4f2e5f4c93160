"""B3 — joins (SURVEY.md §2.B3).

Join-strategy policy for 100 TB (stated once, applied everywhere):

- **Small dimension ⇒ broadcast.** region/nation/supplier-class tables are
  KBs-to-MBs at any scale factor; `F.broadcast()` pins a broadcast hash join
  so the fact table never shuffles (q_join_inner_broadcast). Hints are for
  sides bounded BY CONSTRUCTION; SF-scaling sides (customer slices, supplier)
  get AQE's runtime decision instead — same plan when small, graceful
  shuffle degrade instead of an OOM cliff when not (r8 sweep).
- **Fact-to-fact ⇒ sort-merge on the join key.** Spark shuffles both sides
  by key; AQE handles skew splitting at runtime (q_join_inner_smj).
- **Shuffled-hash** where one side is much smaller but above the broadcast
  threshold (q_join_inner_shj pins it with a hint to prove the strategy).
- **Theta/interval joins** have no hash path; they are bounded with band
  predicates so the nested-loop stays proportional to matches, and the
  bigger side stays partitioned (q_join_theta, q_join_interval).
- **As-of join** (absent in Spark SQL) is composed as time-conditioned join
  + per-left-row rank-1 window — fully distributed, no driver loop. A
  pandas merge_asof variant lives in llm/udfs.py as the applyInPandas demo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_join_inner_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def q_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join against a broadcast dimension (BroadcastHashJoin)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )


@query(
    "q_join_inner_smj",
    oracle="""
    SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_quantity >= 48.0
    """,
)
def q_join_inner_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact equi join pinned to sort-merge — the strategy that
    scales when both sides are too large to broadcast."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48.0)
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .select("o_orderkey", "o_totalprice", "l_linenumber", "l_quantity")
    )


@query(
    "q_join_inner_shj",
    oracle="""
    SELECT s_suppkey, s_name, l_orderkey, l_linenumber
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
    WHERE l_discount > 0.09
    """,
)
def q_join_inner_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join (no sort) — right strategy when one side is small
    per-partition but above the broadcast threshold."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.09)
    return (
        s.hint("shuffle_hash")
        .join(li, s.s_suppkey == li.l_suppkey)
        .select("s_suppkey", "s_name", "l_orderkey", "l_linenumber")
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders (count = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT o_orderkey, c_name
    FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
    RIGHT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every order survives, name NULL for non-BUILDING."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "o_orderkey", "c_name"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT lo.k AS k_low, hi.k AS k_high, lo.n AS n_low, hi.n AS n_high
    FROM (SELECT o_custkey AS k, count(*) AS n FROM orders
          WHERE o_totalprice < 20000 GROUP BY o_custkey) lo
    FULL JOIN (SELECT o_custkey AS k, count(*) AS n FROM orders
               WHERE o_totalprice > 450000 GROUP BY o_custkey) hi
    ON lo.k = hi.k
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two deliberately partial key sets."""
    o = load_table(spark, sf_dir, "orders")
    lo = (
        o.filter(F.col("o_totalprice") < 20000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n"))
    )
    hi = (
        o.filter(F.col("o_totalprice") > 450000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n"))
    )
    return lo.join(hi, lo.k == hi.k, "full").select(
        lo.k.alias("k_low"),
        hi.k.alias("k_high"),
        lo.n.alias("n_low"),
        hi.n.alias("n_high"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — customers having at least one large order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — customers with no order above 300k (non-empty in
    the fixtures, unlike no-orders-at-all: every customer has orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny dimensions (5 × 25 rows)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_acctbal > c_acctbal AND s_acctbal - c_acctbal < 10.0
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/band) join: acctbal within a (0, 10) band.

    Physical plan is BroadcastNestedLoopJoin with the small supplier side
    broadcast; the band predicate keeps output ∝ matches. At 100 TB a band
    join would first bucket both sides on floor(acctbal/band) and join on
    the bucket key ± 1 — the equi-prefilter trick.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = (s.s_acctbal > c.c_acctbal) & (s.s_acctbal - c.c_acctbal < 10.0)
    return F.broadcast(s).join(c, cond).select(
        "s_suppkey", "c_custkey", "s_acctbal", "c_acctbal"
    )


@query(
    "q_join_interval",
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS next_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs of one user within 1 hour — the batch
    shape of a stream-stream time-bounded join. Equi key (user_id) carries
    the shuffle; the time band is a post-join filter, so this scales as a
    hash join, not a nested loop."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("a.event_id").alias("first_id"),
            F.col("b.event_id").alias("next_id"),
            F.col("a.user_id").alias("user_id"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS c_event_id, user_id, ts AS c_ts FROM events
          WHERE event_type = 'click'),
    m AS (
      SELECT p.event_id, c.c_event_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.c_ts DESC, c.c_event_id DESC) AS rn
      FROM p JOIN c ON p.user_id = c.user_id AND p.ts >= c.c_ts
    )
    SELECT p.event_id, p.user_id, p.ts, m.c_event_id AS prior_click_id
    FROM p LEFT JOIN (SELECT event_id, c_event_id FROM m WHERE rn = 1) m
      USING (event_id)
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it (DuckDB's native ASOF JOIN expresses this, but leaves the
    tie choice for equal click timestamps unspecified — the oracle uses
    the identical windowed formulation with the same unique tiebreaker,
    c_event_id DESC, so both engines are fully deterministic).

    Composition: time-conditioned equi join + row_number()=1 per left row,
    then left join back to keep purchases with no prior click. Distributed
    end-to-end — shuffle on user_id, window within (purchase) partitions.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    matched = p.join(
        c, (p.user_id == c.c_user_id) & (p.ts >= c.c_ts), "inner"
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("c_ts").desc(), F.col("c_event_id").desc()
    )
    best = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("c_event_id").alias("prior_click_id"))
    )
    return p.join(best, "event_id", "left").select(
        "event_id", "user_id", "ts", "prior_click_id"
    )


@query(
    "q_join_star",
    oracle="""
    SELECT o_orderkey, o_orderdate, revenue, revenue_rank
    FROM (
      SELECT o_orderkey, o_orderdate,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             row_number() OVER (
               ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
                        o_orderkey) AS revenue_rank
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY o_orderkey, o_orderdate
    ) t
    WHERE revenue_rank <= 10
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped star join: filtered dim ⋈ orders ⋈ lineitem, top-10
    unshipped orders by revenue (rank materialized for the hash check).

    customer(BUILDING) broadcasts while AQE measures it under threshold
    (it scales with SF — a forced hint is an OOM cliff, and the r8 1000x
    probe measured the SMJ degrade working); orders⋈lineitem sort-merges on the
    order key; revenue agg is partial+final; the top-10 is
    TakeOrderedAndProject (limit BEFORE the rank window, so the global
    window only ever sees 10 rows — VERDICT.md r1 pattern).
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    rev = (
        c
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    order = [F.col("revenue").desc(), F.col("o_orderkey").asc()]
    top = rev.orderBy(*order).limit(10)
    return top.withColumn(
        "revenue_rank", F.row_number().over(Window.orderBy(*order))
    ).select("o_orderkey", "o_orderdate", "revenue", "revenue_rank")


@query(
    "q_join_salted",
    oracle="""
    SELECT e.event_id, e.event_type, t.type_weight,
           round(e.value * t.type_weight, 6) AS weighted
    FROM events e
    JOIN (SELECT event_type, count(*)::DOUBLE / 10000 AS type_weight
          FROM events GROUP BY event_type) t
      ON e.event_type = t.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join via salting (extra, beyond §2.B3): events ⋈ dim on
    event_type — FIVE distinct keys, the worst-case skew shape (a plain
    shuffle join lands the whole fact on ≤5 tasks).

    The manual salting pattern: the fact side gets a random-free
    deterministic salt (event_id % N), the dim side is exploded ×N, and the
    join key becomes (event_type, salt) — 5×N evenly sized partitions.
    AQE's OptimizeSkewedJoin automates this at runtime (session.py); the
    explicit form is here because at 100 TB you sometimes need it where AQE
    can't see the skew (e.g. before a stateful streaming join). Result is
    oracle-identical to the unsalted join.
    """
    SALT = 16
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.groupBy("event_type")
        .agg((F.count("*") / 10000).alias("type_weight"))
    )
    salted_fact = e.withColumn("salt", (F.col("event_id") % SALT).cast("int"))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    return (
        salted_fact.join(salted_dim, ["event_type", "salt"])
        .select(
            "event_id",
            "event_type",
            "type_weight",
            F.round(F.col("value") * F.col("type_weight"), 6).alias("weighted"),
        )
    )


@query(
    "q_join_bloom",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: a Bloom filter built from the filtered dimension
    prefilters the fact scan before the exact semi join (the manual form of
    Spark's InjectRuntimeFilter / bloom_filter_agg, which Spark exposes only
    to the optimizer, not to SQL).

    Construction (all DataFrame ops, no UDF):
    - dim keys -> k=3 bit positions in an m=65536-bit filter via independent
      odd-multiplier mixes; distinct positions -> 64-bit words via
      bit_or(shiftleft(1, pos % 64)) — a ~1 KiB bitmap DataFrame.
    - the fact side computes its 3 positions and LEFT-joins the broadcast
      bitmap three times (map-only; no shuffle, no explode of the fact);
      a row is a candidate iff all 3 probed bits are set.
    - candidates then pass the exact semi join (AQE broadcasts the
      SF-scaling dim while it measures small; past that it degrades to a
      shuffle semi over the ~2e-6 candidate set, never an OOM), so false
      positives are eliminated and the result is oracle-identical to the
      plain semi join.

    100 TB plan: the bitmap is KB-sized regardless of fact size, so the
    prefilter is a broadcast map-side operation that drops ~4/5 of the
    fact before any shuffle/join work — exactly what a runtime filter buys
    when the dim predicate is selective. FP rate at these parameters:
    (1 - e^(-3*300/65536))^3 ~ 2e-6 — candidates ≈ true matches.
    """
    M = 1 << 16  # bits in the filter
    MIX = [(2654435761, 97), (2246822519, 51), (3266489917, 13)]

    def positions(key: str) -> list:
        # reduce the key mod M BEFORE the odd-multiplier mix: since M is a
        # power of two, (key*a) mod M ≡ ((key mod M)*a) mod M — the same
        # bit positions for every key — but the product now tops out at
        # 65535 × 3.27e9 ≈ 2.1e14 instead of overflowing int64 (ANSI
        # ARITHMETIC_OVERFLOW crash) once keys exceed ~2.8e9, the
        # magnitude real 100 TB surrogate keys actually reach (caught by
        # the r9 1000× probe, whose key-shift stride puts keys at ~1e10)
        return [
            (((F.col(key) % M) * F.lit(a) + F.lit(b)) % M).alias(f"pos{h}")
            for h, (a, b) in enumerate(MIX)
        ]

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    # pinned: dim_keys feeds the bitmap build AND the exact semi join;
    # words is probed by THREE broadcast joins below — unpinned, each
    # reference re-scanned customer (4 static scans measured; now 1)
    dim_keys = c.select("c_custkey").localCheckpoint(eager=False)
    bits = dim_keys.select(
        F.explode(F.array(*positions("c_custkey"))).alias("pos")
    ).distinct()
    words = (
        bits.groupBy((F.col("pos") / 64).cast("long").alias("widx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
            ).alias("word")
        )
        .localCheckpoint(eager=False)  # the ~1 KiB bitmap, built once
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", *positions("o_custkey")
    )
    cand = o
    for h in range(3):
        w = words.select(
            F.col("widx").alias(f"widx{h}"), F.col("word").alias(f"word{h}")
        )
        cand = cand.join(
            F.broadcast(w),
            (F.col(f"pos{h}") / 64).cast("long") == F.col(f"widx{h}"),
            "left",
        )
    probe_ok = None
    for h in range(3):
        bit = (
            F.expr(f"shiftright(word{h}, cast(pos{h} % 64 as int)) & 1") == 1
        )
        ok = F.col(f"word{h}").isNotNull() & bit
        probe_ok = ok if probe_ok is None else (probe_ok & ok)
    cand = cand.filter(probe_ok)

    return (
        cand.join(dim_keys, cand.o_custkey == F.col("c_custkey"), "semi")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


_RANGE_BUCKET_US = 300_000_000  # 5-minute band and bucket width


@query(
    "q_join_range_bucketed",
    oracle=f"""
    SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_neighbors
    FROM events a LEFT JOIN events b
      ON b.user_id <> a.user_id
     AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {_RANGE_BUCKET_US}
    GROUP BY a.event_id
    """,
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: each event's count of OTHER users' events
    within ±5 minutes — computed WITHOUT a nested-loop band join. Time is
    quantized into band-width buckets; the probe side explodes to its
    bucket ±1, the build side keeps its own bucket, and the band becomes
    an EQUI-join on the bucket id with the exact |Δt| <= band predicate as
    a row-local post-filter. Each candidate pair appears exactly once
    (the build event's bucket is unique), so no dedup is needed. This is
    the manual form of the range-join-hint optimization (and the oracle
    is the naive band join, proving result equality).

    100 TB plan: the equi-join on bucket shuffles both sides on a
    uniform, time-ordered key (3x fan-out on the probe side only) —
    against the naive plan's O(n²) nested loop this is the difference
    between a partitionable shuffle join and a single-machine death. Zero-
    neighbor events are restored by a final left join of the counts onto
    the event spine (aggregate⋈spine on the unique event key).
    """
    B = _RANGE_BUCKET_US
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    probe = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                (F.col("us") / B).cast("long") - 1,
                (F.col("us") / B).cast("long"),
                (F.col("us") / B).cast("long") + 1,
            )
        ).alias("bkt"),
    )
    build = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        (F.col("us") / B).cast("long").alias("bkt"),
    )
    counts = (
        probe.join(build, "bkt")
        .filter(
            (F.col("a_user") != F.col("b_user"))
            & (F.abs(F.col("b_us") - F.col("a_us")) <= B)
        )
        .groupBy("a_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        e.select(F.col("event_id"))
        .join(counts, e.event_id == counts.a_id, "left")
        .select(
            "event_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )


@query(
    "q_join_asof_forward",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS c_event_id, user_id AS c_user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), matched AS (
      SELECT p.event_id, c.c_event_id, c.c_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.c_ts, c.c_event_id) AS rn
      FROM p JOIN c
        ON p.user_id = c.c_user_id
       AND c.c_ts >= p.ts
       AND c.c_ts <= p.ts + INTERVAL 1 HOUR
    )
    SELECT p.event_id, p.user_id, p.ts,
           m.c_event_id AS next_click_id
    FROM p LEFT JOIN (SELECT event_id, c_event_id FROM matched WHERE rn = 1) m
      USING (event_id)
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each purchase matched to the
    user's EARLIEST click at-or-after it, but only within 1 hour — the
    other half of the merge_asof API surface (q_join_asof is the
    backward form; `tolerance` is what keeps a forward match from
    latching onto a click three weeks later and calling it attribution).
    Ties on equal click timestamps break on c_event_id ASC — fully
    deterministic on both engines, where native ASOF JOIN leaves the
    choice unspecified.

    100 TB plan: identical cost envelope to the backward form — the
    band condition (user equi-key + bounded time window) keeps the
    pre-window pair count per purchase bounded by per-user activity
    within ONE HOUR (the tolerance is also the join's pruning bound, a
    fact a range-join-capable planner exploits directly); the pick
    window partitions per purchase.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    matched = p.join(
        c,
        (p.user_id == c.c_user_id)
        & (c.c_ts >= p.ts)
        & (c.c_ts <= p.ts + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    w = Window.partitionBy("event_id").orderBy("c_ts", "c_event_id")
    best = (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", F.col("c_event_id").alias("next_click_id"))
    )
    return p.join(best, "event_id", "left").select(
        "event_id", "user_id", "ts", "next_click_id"
    )
