"""B7 — set operations (SURVEY.md §2.B7).

UNION ALL is a zero-shuffle concatenation of inputs; the DISTINCT variants
shuffle on the full row (hash-partition + dedup) — at 100 TB prefer
unionAll + downstream aggregate over union-distinct when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


def _urgent_keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


def _big_keys(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_custkey")
    )


@query(
    "q_set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag concat, no shuffle)."""
    return _urgent_keys(spark, sf_dir).unionByName(_big_keys(spark, sf_dir))


@query(
    "q_set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with set semantics (concat + distinct)."""
    return (
        _urgent_keys(spark, sf_dir).unionByName(_big_keys(spark, sf_dir)).distinct()
    )


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two key sets."""
    return _urgent_keys(spark, sf_dir).intersect(_big_keys(spark, sf_dir))


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two sides)."""
    return _urgent_keys(spark, sf_dir).intersectAll(_big_keys(spark, sf_dir))


@query(
    "q_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct difference)."""
    return _urgent_keys(spark, sf_dir).subtract(_big_keys(spark, sf_dir))


@query(
    "q_set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 350000
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicities subtract)."""
    return _urgent_keys(spark, sf_dir).exceptAll(_big_keys(spark, sf_dir))


@query(
    "q_set_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def q_set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a column subset — only the key columns are
    projected, since WHICH source row survives subset-dedup is
    nondeterministic (SURVEY.md §5.3#3)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates(["l_returnflag", "l_linestatus"])
    )
