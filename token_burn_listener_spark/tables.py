"""Table loading: name -> DataFrame, with fixture normalizations applied.

The ten driver fixtures (TESTDATA.md) are plain parquet files. Two
normalizations happen here so every operator downstream sees clean types:

- ``events.ts`` is parquet timestamp[ns]; under the nanosAsLong conf it reads
  as LongType nanoseconds. We convert with INTEGER division to microseconds
  (``ts div 1000`` — float division corrupts low-order digits, ns epochs
  exceed double's 2^53 integer range; SURVEY.md §7.5#2). DuckDB reads the
  same column µs-truncated, so converted values match the oracle exactly.

Scale note: at 100 TB these would be partitioned datasets (events by date),
and this loader is where partition-pruning-friendly layout assumptions live;
for the fixtures each table is a single file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with normalizations applied."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Fixture timestamps are naive (no isAdjustedToUTC); if the session
    # could not apply inferTimestampNTZ=false (static conf in some
    # deployments), normalize here: under session TZ UTC the NTZ->LTZ cast
    # is value-preserving and matches DuckDB's naive-as-TIMESTAMP read.
    for cname, ctype in df.dtypes:
        if ctype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register fixture tables as temp views (for spark.sql entry points)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
