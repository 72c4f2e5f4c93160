"""SparkSession construction and runtime configuration.

Two entry modes:

- The driver hands us an already-running session (``__spark_entry__.entry`` /
  ``queries()`` callables). We cannot rebuild it, so every conf we need MUST
  be settable at runtime — ``configure(spark)`` applies them via
  ``spark.conf.set`` (verified to work on a live session, SURVEY.md §7.5#1).
- Tests / bench build their own session via ``get_spark()``.

Scale notes (100 TB): AQE stays on so skewed shuffles re-plan at runtime;
shuffle partitions are sized for the local fixtures here but are a deploy-time
knob (at 100 TB you want O(data/128MB) partitions or simply AQE's coalescing
from a high initial count).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and verified working) to set on a live session.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries timestamp[ns]; Spark 4.1 refuses INT64
    # TIMESTAMP(NANOS) without this (SURVEY.md §7.5#1). The column then
    # reads as LongType nanos-since-epoch; tables.load_table converts.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # The r4-regenerated fixtures write timestamp[us] WITHOUT the
    # isAdjustedToUTC flag; Spark 4 would infer TIMESTAMP_NTZ, which breaks
    # unix_micros()/window() and diverges from DuckDB's naive-as-TIMESTAMP
    # read. Read them as TIMESTAMP_LTZ (session TZ is UTC, so wall-clock
    # values are identical). tables.load_table also casts any NTZ column
    # for sessions where this conf cannot be applied.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Deterministic timestamp rendering regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, switch SMJ->broadcast when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    # Local-fixture sizing (the driver's vanilla session defaults to 200):
    # fewer, fuller partitions; AQE re-coalesces. Streaming state stores are
    # keyed per shuffle partition, so this also bounds per-query state files.
    # At 100 TB this is a deploy-time knob: O(input/128MB) initial partitions.
    "spark.sql.shuffle.partitions": "32",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # A conf may be marked static in some deployments; the session
            # owner is then responsible for it. Never fail the query path.
            pass
    return spark


def get_spark(
    app_name: str = "token-burn-listener-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a local session sized for this machine.

    ``SPARK_GRAFT_CPUS`` (driver contract) controls local parallelism.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # Arrow for pandas UDF / toPandas hops (B11 operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return configure(builder.getOrCreate())
