"""token_burn_listener_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the reference project ``aeternity/token-burn-listener``
(an Ethereum token-burn event listener; see SURVEY.md §0 — the reference
checkout at /root/reference is empty, so behavior is reconstructed from
public knowledge and the driver contract), generalized into:

- a full relational batch surface (scans, projections, joins, aggregations,
  windows, sorts, set ops, scalar functions) — SURVEY.md §2.B1–B8;
- a Structured Streaming surface reproducing the reference's
  ingest→decode→filter→dedup→upsert lifecycle — §2.B9 / §2.A;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal binary columns) — §2.B10–B11.

Everything is the DataFrame/SQL API: Catalyst plans, Tungsten execution,
no RDDs, no custom optimizer rules (SURVEY.md §4.2).
"""

from token_burn_listener_spark.session import configure, get_spark
from token_burn_listener_spark.tables import TABLE_NAMES, load_table, register_views

__all__ = [
    "configure",
    "get_spark",
    "TABLE_NAMES",
    "load_table",
    "register_views",
]
