"""B11 — the UDF / UDAF / UDTF escape-hatch surface (SURVEY.md §2.B11).

Policy (SURVEY.md §2.B11, 100 TB): builtin > pandas_udf > plain Python UDF.
UDFs appear ONLY here — every key in B1–B10 uses Catalyst-visible builtins,
because a Python UDF is an optimizer barrier (no pushdown through it, no
codegen across it). This module exists to prove the escape hatch works and
is vectorized where it matters:

- plain ``F.udf``: row-at-a-time, pickled — the slow path, one key only;
- ``@pandas_udf`` scalar/agg and ``applyInPandas``/``mapInPandas``: Arrow
  batch transfer, ~10-100× the throughput of row-at-a-time;
- ``@udtf``: Python table function (lateral join).

Every key has a builtin-SQL oracle double — the UDF must reproduce what the
relational engine computes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


@query(
    "q_udf_python",
    oracle="""
    SELECT doc_id,
           upper(trim(regexp_replace(text, ' +', ' ', 'g'))) AS norm_text
    FROM documents
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF: whitespace-collapsing uppercase normalizer.

    Row-at-a-time and pickled — kept as the single demonstration of the
    slowest UDF tier; the oracle re-expresses the same normalization
    relationally.
    """
    norm = F.udf(lambda s: " ".join(s.split()).upper(), "string")
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", norm("text").alias("norm_text"))


@query(
    "q_udf_pandas_scalar",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow UDF (Series→Series): L2 norm via numpy.

    Elements are promoted to float64 before the dot product so the
    arithmetic matches the double-precision oracle.
    """

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        return vecs.map(
            lambda v: round(float(np.sqrt(np.dot(a := np.asarray(v, "float64"), a))), 6)
        )

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", l2_norm("embedding").alias("l2_norm"))


@query(
    "q_udf_pandas_agg",
    oracle="""
    SELECT event_type,
           round((sum(value) - min(value) - max(value)) / (count(*) - 2), 6)
               AS trimmed_mean
    FROM events GROUP BY event_type
    """,
)
def q_udf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: mean excluding one min and one max.

    A custom UDAF shape Spark has no builtin for — the oracle states the
    identical closed form relationally.
    """

    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        return round(float((v.sum() - v.min() - v.max()) / (len(v) - 2)), 6)

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        trimmed_mean("value").alias("trimmed_mean")
    )


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS z
    FROM events
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-group z-score normalization (ddof=1 ≡ stddev_samp).

    The grouped-map pattern for per-entity feature normalization: one
    shuffle on the group key, then pure in-pandas arithmetic per group.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"],
             "z": z.round(6)}
        )

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").applyInPandas(
        zscore, "event_id long, event_type string, z double"
    )


@query(
    "q_udf_map_iter",
    oracle="""
    SELECT event_id, round(value * 0.92, 6) AS value_eur
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_udf_map_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: partition-wise filter + currency conversion.

    The streaming-friendly per-partition transform shape (same body a
    foreachBatch enrichment would use); Arrow batches in and out.
    """

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            purchases = pdf[pdf["event_type"] == "purchase"]
            yield pd.DataFrame(
                {
                    "event_id": purchases["event_id"],
                    "value_eur": (purchases["value"] * 0.92).round(6),
                }
            )

    e = load_table(spark, sf_dir, "events")
    return e.mapInPandas(convert, "event_id long, value_eur double")


@query(
    "q_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF exploding each document into (doc_id, token) rows.

    Registered and invoked via LATERAL — the table-function escape hatch
    for one-to-many Python logic (F.udtf verified in PySpark 4.1.2,
    SURVEY.md §7.5#4).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class SplitDoc:
        def eval(self, doc_id: int, text: str):
            for token in text.split(" "):
                yield doc_id, token

    spark.udtf.register("split_doc", SplitDoc)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_for_udtf"
    )
    return spark.sql(
        "SELECT s.doc_id, s.token "
        "FROM documents_for_udtf d, LATERAL split_doc(d.doc_id, d.text) s"
    )


@query(
    "q_udf_cogroup",
    oracle="""
    WITH p AS (SELECT user_id, count(*) AS n_purchases,
                      round(sum(value), 6) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    v AS (SELECT user_id, count(*) AS n_views
          FROM events WHERE event_type = 'view' GROUP BY user_id)
    SELECT coalesce(p.user_id, v.user_id) AS user_id,
           coalesce(p.n_purchases, 0) AS n_purchases,
           coalesce(p.purchase_value, 0.0) AS purchase_value,
           coalesce(v.n_views, 0) AS n_views
    FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: per-user merge of two grouped relations.

    ``groupBy().cogroup().applyInPandas`` hands BOTH groups for a key to one
    Python function — the escape hatch for custom merge logic (as-of joins,
    interleaving, feature stitching). The oracle re-states this instance as
    a full outer join of two aggregates.
    """

    def merge(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
        uid = (
            purchases["user_id"].iloc[0]
            if len(purchases)
            else views["user_id"].iloc[0]
        )
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(purchases)],
                "purchase_value": [round(float(purchases["value"].sum()), 6)],
                "n_views": [len(views)],
            }
        )

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").groupBy("user_id")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id")
    return p.cogroup(v).applyInPandas(
        merge,
        "user_id long, n_purchases long, purchase_value double, n_views long",
    )
