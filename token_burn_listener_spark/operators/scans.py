"""B1 — scans / sources (SURVEY.md §2.B1).

Reference parity: the listener's only "scan" is reading events from its
source with a source-side filter (SURVEY.md §2.A rows A1-A3); here that
generalizes to Spark's datasource scans with column pruning and predicate
pushdown handled by Catalyst (verify with .explain: ReadSchema narrows,
PushedFilters populated).

Scale notes: parquet scans are the 100 TB entry point — column pruning and
row-group statistics pushdown are what keep a 2-column projection from
reading 100 TB. The JSON/CSV sources exist for ingest parity (the reference
consumed JSON event objects); at scale those are one-time conversions into
columnar layout, never the query-time format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.scratch import materialize, scratch_dir
from token_burn_listener_spark.tables import load_table

REGION_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)


def _ensure_region_copy(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Derive a JSON/CSV copy of region once, atomically (see scratch.py)."""
    region = load_table(spark, sf_dir, "region")
    if fmt == "json":
        write = lambda df, p: df.coalesce(1).write.json(p)
    else:
        write = lambda df, p: df.coalesce(1).write.option("header", True).csv(p)
    return materialize(
        region,
        scratch_dir(sf_dir, f"region_{fmt}", source=f"{sf_dir}/region.parquet"),
        write,
    )


@query(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan of the fact table — all columns, all rows."""
    return load_table(spark, sf_dir, "lineitem")


@query(
    "q_scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def q_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-column projection; Catalyst prunes the parquet ReadSchema to 2 cols."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "q_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 49.0
    """,
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate reaching the parquet reader (PushedFilters: GreaterThanOrEqual)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_scan_json",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source with explicit schema-on-read (reference ingests JSON events).

    The JSON copy is derived from the region fixture, so the parquet-backed
    oracle checks content equality across formats.
    """
    path = _ensure_region_copy(spark, sf_dir, "json")
    return spark.read.schema(REGION_SCHEMA).json(path).select("r_regionkey", "r_name")


@query(
    "q_scan_csv",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with header + explicit schema."""
    path = _ensure_region_copy(spark, sf_dir, "csv")
    return (
        spark.read.schema(REGION_SCHEMA)
        .option("header", True)
        .csv(path)
        .select("r_regionkey", "r_name")
    )


@query("q_scan_binaryfile")  # rows-only: mtime/paths are machine-local
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source: multimodal ingestion shape (path, length, content).

    Emits filename + byte length + content sha2 — the schema a 100 TB
    image/audio corpus would use (binary column + typed metadata).
    """
    return (
        spark.read.format("binaryFile")
        .load(f"{sf_dir}/*.parquet")
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("length").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("content_sha256"),
        )
        .orderBy("file_name")
    )
