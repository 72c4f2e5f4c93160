"""B8 — scalar functions: string / date / math / array / map / JSON / hash
(SURVEY.md §2.B8).

Reference parity: the listener's per-event transforms were scalar — hex→int
conversion of uint256 amounts, JSON payload field extraction, string
normalization of addresses/hashes (SURVEY.md §2.A rows A4-A5; the checkout is
empty, §0, so the mapping is against the reconstructed inventory). Here each
family is exercised as a Catalyst-native expression so the whole projection
stays inside whole-stage codegen — no Python in the loop.

Cross-engine oracle notes (verified live against DuckDB 1.0.0):
- DuckDB ``dayofweek`` is 0=Sunday; Spark is 1=Sunday → oracle adds 1.
- DuckDB ``date_trunc('month', ts)`` returns DATE → cast ``::TIMESTAMP``.
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics.
- DuckDB ``to_hex`` and Spark ``hex`` both emit unpadded uppercase.
- DuckDB ``to_json(struct_pack(...))`` and Spark ``to_json(struct(...))``
  produce byte-identical compact JSON for non-null fields.
- Int-width discipline (SURVEY.md §5.3#5): every computed integer column is
  cast to Long on the Spark side to match DuckDB's BIGINT.
- Float outputs of real arithmetic are rounded to 6dp on BOTH sides.

Scale notes (100 TB): every expression here is a narrow per-row projection —
no shuffle, no state; cost is dominated by the scan, so column pruning is
what matters (each query selects only the columns it emits). The array HOFs
(transform/filter/aggregate/zip_with) run inside codegen over the array
values, which is why they are preferred over a pandas UDF for vector math at
this width (64 floats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table

# ---------------------------------------------------------------------------
# Strings
# ---------------------------------------------------------------------------


@query(
    "q_str_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                    AS up_name,
           lower(p_brand)                   AS lo_brand,
           length(p_name)                   AS name_len,
           substring(p_name, 1, 5)          AS name_head,
           lpad(p_brand, 12, '*')           AS brand_pad,
           replace(p_type, ' ', '_')        AS type_snake,
           trim(concat(' ', p_name, ' '))   AS trimmed
    FROM part
    """,
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/upper/lower/trim/lpad/length/substring/replace in one projection."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@query(
    "q_str_split",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    GROUP BY token
    """,
)
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode p_name into tokens, then count per token.

    Scale: explode multiplies rows before the aggregation; partial+final
    hash agg keeps the shuffle to one (token, count) pair per map task.
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_str_regex",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_type, '^(\w+)', 1)          AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g')  AS masked,
           regexp_matches(p_type, 'BRASS')              AS has_brass
    FROM part
    """,
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike (DuckDB needs the 'g' flag)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("masked"),
        F.col("p_type").rlike("BRASS").alias("has_brass"),
    )


# ---------------------------------------------------------------------------
# Dates
# ---------------------------------------------------------------------------


@query(
    "q_date_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                          AS y,
           month(o_orderdate)                         AS m,
           day(o_orderdate)                           AS d,
           dayofweek(o_orderdate) + 1                 AS dow,
           date_trunc('month', o_orderdate)::TIMESTAMP AS month_start
    FROM orders
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/date_trunc (DuckDB dow is 0=Sun → +1)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', o_orderdate::DATE, DATE '2000-01-01') AS days_to_y2k,
           o_orderdate + INTERVAL 3 MONTH                          AS plus_3m,
           o_orderdate - INTERVAL 7 DAY                            AS minus_7d,
           (o_orderdate + INTERVAL 1 MONTH)::DATE                  AS next_month
    FROM orders
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / interval arithmetic / add_months (clamps month-end both engines)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_3m"),
        F.expr("o_orderdate - INTERVAL 7 DAY").alias("minus_7d"),
        F.add_months("o_orderdate", 1).alias("next_month"),
    )


@query(
    "q_date_unix",
    oracle="""
    SELECT event_id,
           epoch_us(ts)             AS micros,
           epoch_us(ts) // 1000000  AS secs,
           ts                       AS roundtrip
    FROM events
    """,
)
def q_date_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch round-trips on the nanos-fixture column (SURVEY.md §7.5#1-2).

    load_table has already normalized ts to µs-precision TimestampType via
    integer division, so unix_micros here matches DuckDB's epoch_us exactly.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_micros("ts").alias("micros"),
        F.expr("unix_micros(ts) div 1000000").alias("secs"),
        F.timestamp_micros(F.unix_micros("ts")).alias("roundtrip"),
    )


# ---------------------------------------------------------------------------
# Math
# ---------------------------------------------------------------------------


@query(
    "q_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2)                 AS price_r2,
           floor(l_extendedprice)::DOUBLE            AS price_floor,
           ceil(l_extendedprice)::DOUBLE             AS price_ceil,
           abs(l_extendedprice - 1000)::DOUBLE       AS price_dist,
           round(pow(l_quantity, 2), 6)              AS qty_sq,
           round(sqrt(l_extendedprice), 6)           AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)         AS price_ln,
           (l_linenumber % 3)::BIGINT                AS line_mod,
           sign(l_discount - 0.05)::BIGINT           AS disc_sign
    FROM lineitem
    """,
)
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/pow/sqrt/ln/mod/sign — all codegen'd, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 1000).alias("price_dist"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_linenumber") % 3).cast("long").alias("line_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
    )


@query(
    "q_math_conv",
    oracle="""
    SELECT o_orderkey,
           lower(to_hex(o_orderkey)) AS hex_str,
           o_orderkey                AS decoded
    FROM orders
    """,
)
def q_math_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex round-trip, Ethereum-flavored (SURVEY.md §2.A A5: uint256 hex→int).

    Spark encodes with hex() and decodes with conv(_,16,10); the oracle
    cross-checks the encoding against DuckDB's to_hex and the decoding
    against the original key — a full round-trip proof.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lower(F.hex("o_orderkey")).alias("hex_str"),
        F.conv(F.hex("o_orderkey"), 16, 10).cast("long").alias("decoded"),
    )


# ---------------------------------------------------------------------------
# Arrays (incl. higher-order functions)
# ---------------------------------------------------------------------------


@query(
    "q_arr_basic",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(string_split(text, ' ')), ' ')
                                                           AS sorted_tokens
    FROM documents
    """,
)
def q_arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_contains / sort_array over tokenized document text.

    The sorted token list is emitted as a space-joined STRING, not a raw
    ArrayType column: the driver's pandas canonicalizer sorts result rows and
    list cells are unhashable/unsortable there (r03 RED row). Same values,
    driver-sortable type.
    """
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.array_join(F.sort_array(tokens), " ").alias("sorted_tokens"),
    )


@query(
    "q_arr_hof",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
               AS l2_norm,
           len([x for x in embedding if x > 0]) AS n_pos,
           round(embedding[1]::DOUBLE * 2, 6)   AS head_x2
    FROM embeddings
    """,
)
def q_arr_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order fns: transform → aggregate (L2 norm), filter, element math.

    The float elements are cast to double BEFORE multiplying so both engines
    run identical double-precision FP (float*float would round differently).
    Scale: this is the vector-math pattern for 100 TB embedding corpora —
    per-row codegen, no UDF, no shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    sq_sum = F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.element_at(as_double, 1) * 2, 6).alias("head_x2"),
    )


@query(
    "q_arr_explode",
    oracle="""
    SELECT vec_id,
           unnest(range(len(embedding)))  AS pos,
           unnest(embedding::DOUBLE[])    AS val
    FROM embeddings
    """,
)
def q_arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode embeddings → (vec_id, pos, val) long format.

    DuckDB zips the two aligned unnests; Spark's posexplode emits the same
    0-based ordinality.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val")).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


@query(
    "q_arr_zip",
    oracle="""
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[],
                                  list_reverse(embedding::DOUBLE[])), 6) AS rev_dot
    FROM embeddings
    """,
)
def q_arr_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with elementwise product against the reversed vector, then sum."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    prods = F.zip_with(as_double, F.reverse(as_double), lambda x, y: x * y)
    rev_dot = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    return e.select("vec_id", F.round(rev_dot, 6).alias("rev_dot"))


# ---------------------------------------------------------------------------
# Map / JSON
# ---------------------------------------------------------------------------


@query(
    "q_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json the props payload into a typed struct and extract k.

    Reference parity: ABI-decode of the event payload (SURVEY.md §2.A A4) —
    schema-on-read of a JSON string column into typed fields.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").cast("long").alias("k_val"),
    )


@query(
    "q_json_tuple",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k,
           count(*)                          AS n,
           round(sum(value), 6)              AS sum_value
    FROM events
    GROUP BY k
    """,
)
def q_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple extraction used as a grouping key."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.json_tuple("props", "k").alias("k"), "value")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


@query(
    "q_json_to",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id,
                               event_type := event_type))::VARCHAR AS js
    FROM events
    """,
)
def q_json_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-serialize a struct to JSON (verified byte-identical across engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("js"),
    )


# ---------------------------------------------------------------------------
# Hashes
# ---------------------------------------------------------------------------


@query(
    "q_hash_sha2",
    oracle="SELECT doc_id, sha256(text) AS sha FROM documents",
)
def q_hash_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2-256 content fingerprint (the exact-dedup key, B10)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("sha"))


@query(
    "q_hash_md5",
    oracle="SELECT doc_id, md5(text) AS h FROM documents",
)
def q_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("h"))


@query("q_hash_xxhash")  # rows-only: Spark-specific seed/implementation
def q_hash_xxhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 — Spark's shuffle/bloom hash; no DuckDB twin (SURVEY.md §2.B8)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.xxhash64("text").alias("xx"))


@query(
    "q_struct_ops",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_custkey) AS n_orders
      FROM orders
    )
    SELECT o_custkey,
           round(o_totalprice, 2) AS cheapest_price,
           o_orderkey AS cheapest_okey,
           n_orders
    FROM r WHERE rn = 1
    """,
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct column surface (B8 completion): construct a named struct,
    aggregate with struct ORDERING (min over (price, okey) structs is
    lexicographic — Spark's native argmin idiom), then project nested
    fields back out. The oracle states the same semantics with a window,
    proving the struct path yields the relational answer.

    100 TB plan: min(struct) folds in partial aggregation exactly like any
    min — one shuffle on the group key, constant state per group; no
    window, no sort. This is the cheap deterministic argmin pattern the
    engine uses wherever "the row that achieves the extreme" is needed.
    """
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_totalprice").alias("price"), F.col("o_orderkey").alias("okey")
    )
    return (
        o.groupBy("o_custkey")
        .agg(F.min(s).alias("m"), F.count("*").alias("n_orders"))
        .select(
            "o_custkey",
            F.round(F.col("m.price"), 2).alias("cheapest_price"),
            F.col("m.okey").alias("cheapest_okey"),
            "n_orders",
        )
    )
