"""B10 — embedding similarity search (SURVEY.md §2.B10).

Vector math stays in Catalyst: the dot product is
``aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, +)`` over double-cast
elements — whole-stage-codegen'd JVM arithmetic, no UDF, no Python.

Scale story (100 TB of embeddings):
- ``q_llm_cosine_topk`` is the documented O(n²) exception (SURVEY.md §7.4):
  exact brute force as the small-corpus oracle baseline. Its top-k is
  TakeOrderedAndProject (orderBy().limit(k) BEFORE the rank window), so
  only k rows ever reach a single task — the anti-pattern VERDICT.md
  flagged (global rank window over the full input) is avoided.
- ``q_llm_knn_query`` broadcasts ONE query vector — a map-side scan with a
  global top-k reduce; this shape scales linearly and is what a vector
  serving path compiles to.
- ``q_llm_ann_lsh`` is the at-scale ANN path: random hyperplane/projection
  bucketing (seeded) so candidate generation is a bucket join, not a cross
  join. Recall vs the exact top-k is asserted in tests/test_llm.py.
- ``q_llm_centroids`` is the "group-by over vectors" building block (IVF
  coarse quantizer training step): posexplode → (label, pos) partial+final
  avg — one shuffle keyed (label, pos), 640 groups here, never skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


def as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2(a) -> Column:
    return F.sqrt(dot(a, a))


@query(
    "q_llm_cosine_topk",
    oracle="""
    WITH p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) AS cos_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    top AS (
      SELECT vec_a, vec_b, cos_sim FROM p
      ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 20
    )
    SELECT vec_a, vec_b, cos_sim,
           row_number() OVER (ORDER BY cos_sim DESC, vec_a, vec_b) AS rnk
    FROM top
    """,
)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 most-similar pairs, brute force (the documented O(n²)
    oracle baseline — LSH below is the at-scale path).

    Rank is materialized (order-insensitive driver hash, SURVEY.md §2.B6
    note) but computed on the 20-row TakeOrderedAndProject result, not the
    full pair set.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), as_double("embedding").alias("ea")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), as_double("embedding").alias("eb")
    )
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    sims = pairs.select(
        "vec_a",
        "vec_b",
        F.round(dot("ea", "eb") / (l2("ea") * l2("eb")), 6).alias("cos_sim"),
    )
    top = sims.orderBy(F.desc("cos_sim"), "vec_a", "vec_b").limit(20)
    w = Window.orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
    return top.withColumn("rnk", F.row_number().over(w))


@query(
    "q_llm_knn_query",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             round(list_cosine_similarity(
                 embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
               6) AS cos_sim
      FROM embeddings WHERE vec_id <> 0
    ),
    top AS (SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 10)
    SELECT vec_id, cos_sim,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
    FROM top
    """,
)
def q_llm_knn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-NN of one query vector (vec_id 0) against the corpus.

    The query vector is collected once (64 floats, bounded) and inlined as
    a literal array — the broadcast-scalar pattern: the scan stays a single
    map-side pass plus a k-row global top-k.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qcol = F.array(*[F.lit(float(v)) for v in qvec])
    sims = (
        e.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                dot(as_double("embedding"), qcol)
                / (l2(as_double("embedding")) * l2(qcol)),
                6,
            ).alias("cos_sim"),
        )
    )
    top = sims.orderBy(F.desc("cos_sim"), "vec_id").limit(10)
    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    return top.withColumn("rnk", F.row_number().over(w))


@query("q_llm_ann_lsh")  # rows-only: LSH buckets are engine-specific;
# recall vs q_llm_cosine_topk's exact answer is asserted in tests/test_llm.py
def q_llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via seeded random-projection LSH (the scale path).

    BucketedRandomProjectionLSH hashes vectors into distance-preserving
    buckets; approxNearestNeighbors probes the query's buckets instead of
    scanning the corpus. Euclidean distance on unit-normalized vectors is
    monotone in cosine (d² = 2 − 2·cos), so the ANN ranking is
    cosine-consistent.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    unit = F.transform(
        as_double("embedding"), lambda x: x / l2(as_double("embedding"))
    )
    vecs = e.select("vec_id", array_to_vector(unit).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        seed=42,
        bucketLength=0.5,
        numHashTables=3,
    )
    model = lsh.fit(vecs)
    qrow = vecs.filter(F.col("vec_id") == 0).collect()[0]
    neighbors = model.approxNearestNeighbors(
        vecs.filter(F.col("vec_id") != 0), qrow.features, 10, distCol="eucl_dist"
    )
    return neighbors.select("vec_id", F.round("eucl_dist", 6).alias("eucl_dist"))


@query(
    "q_llm_centroids",
    oracle="""
    WITH x AS (
      SELECT label, unnest(range(len(embedding))) AS pos,
             unnest(embedding::DOUBLE[]) AS val
      FROM embeddings
    )
    SELECT label, pos, round(avg(val), 6) AS c FROM x GROUP BY 1, 2
    """,
)
def q_llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector in long form (label, pos, c) — vector group-by."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(as_double("embedding")).alias("pos", "val"))
        .groupBy("label", F.col("pos").cast("long").alias("pos"))
        .agg(F.round(F.avg("val"), 6).alias("c"))
    )


@query(
    "q_llm_ivf_search",
    oracle="""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    cent AS (
      SELECT label, pos, avg(val) AS c FROM (
        SELECT label, unnest(range(len(embedding))) AS pos,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings) x
      GROUP BY 1, 2
    ),
    cdist AS (
      SELECT label,
             round(sum((c - (SELECT qv FROM q)[pos + 1])
                       * (c - (SELECT qv FROM q)[pos + 1])), 6) AS d2
      FROM cent GROUP BY label
    ),
    probed AS (SELECT label FROM cdist ORDER BY d2, label LIMIT 2),
    cand AS (
      SELECT e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                                          (SELECT qv FROM q)), 6) AS cos_sim
      FROM embeddings e JOIN probed USING (label)
      WHERE e.vec_id <> 0
    ),
    top AS (SELECT vec_id, cos_sim FROM cand
            ORDER BY cos_sim DESC, vec_id LIMIT 10)
    SELECT vec_id, cos_sim,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rnk
    FROM top
    """,
)
def q_llm_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) vector search: probe the 2 nearest clusters only
    (extra, beyond §2.B10 — the scale path q_llm_knn_query's full scan
    becomes at 100 TB).

    The label column is the coarse quantizer's cluster assignment (what
    q_llm_centroids trains); search = rank centroids by distance to the
    query, then brute-force ONLY the probed clusters — a partition-pruned
    scan of ~nprobe/nlist of the corpus instead of all of it. Fully
    declarative: centroid ranking is a 640-row aggregate, probed-cluster
    routing is a broadcast join.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qcol = F.array(*[F.lit(float(v)) for v in qvec])

    cent = (
        e.select("label", F.posexplode(as_double("embedding")).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg("val").alias("c"))
    )
    diff = F.col("c") - F.element_at(qcol, F.col("pos") + 1)
    cdist = cent.groupBy("label").agg(F.round(F.sum(diff * diff), 6).alias("d2"))
    probed = cdist.orderBy("d2", "label").limit(2).select("label")

    cand = (
        e.join(F.broadcast(probed), "label")
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                dot(as_double("embedding"), qcol)
                / (l2(as_double("embedding")) * l2(qcol)),
                6,
            ).alias("cos_sim"),
        )
    )
    top = cand.orderBy(F.desc("cos_sim"), "vec_id").limit(10)
    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    return top.withColumn("rnk", F.row_number().over(w))
