"""Driver contract for the spark-graft builder (PySpark target).

Wired to token_burn_listener_spark: a PySpark-native engine with the
capabilities of aeternity/token-burn-listener (see SURVEY.md; the reference
checkout is empty — §0 — so parity is against the driver contract and the
reconstructed public behavior).

- ``entry(spark)``     — flagship TPC-H-Q1-shaped pricing summary at sf0.001.
- ``queries()``        — every implemented operator (SURVEY.md §2.B keys).
- ``oracle_sql()``     — DuckDB-runnable oracle per key (omitted only for
                         engine-specific outputs: hashes, approx sketches,
                         LSH, binary ingestion — the `rows`-marked keys).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from token_burn_listener_spark.registry import (
    ORACLES,
    QUERIES,
    load_all_modules,
    ordered_keys,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    load_all_modules()
    return QUERIES["q_agg_groupby"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by registry.DRIVER_ORDER: the driver's correctness run records
    exactly the first 50 keys, so never-driver-checked keys come first and
    the set rotates each round (see the DRIVER_ORDER comment).
    """
    load_all_modules()
    return {k: QUERIES[k] for k in ordered_keys()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per key (same column aliases as the Spark query)."""
    load_all_modules()
    return {k: ORACLES[k] for k in ordered_keys() if k in ORACLES}
