"""B10 — document deduplication (SURVEY.md §2.B10; north star BASELINE.json:6).

Two tiers, matching how a 100 TB training-data pipeline actually dedups:

- **Exact**: hash-groupBy on a content fingerprint. One shuffle on the
  64-hex-char sha256 key, partial+final agg, deterministic survivor
  (min doc_id). At 100 TB this is the cheap first pass — the hash key is
  tiny and uniformly distributed, so no skew.
- **Near**: MinHash-LSH banding over character 5-gram shingles. Shingle →
  hashed binary feature vector → ``numHashTables`` OR-amplified MinHash
  signatures; ``approxSimilarityJoin`` joins only within matching signature
  buckets (a shuffle on hash values), then computes EXACT Jaccard distance
  on the candidate pairs. No O(n²) crossJoin anywhere — candidate
  generation is the LSH bucket join, which is the at-scale path
  (SURVEY.md §7.4). Seeded for determinism; recall vs exact Jaccard is
  asserted in tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table


def shingles(text: str | Column = "text", n: int = 5) -> Column:
    """Distinct character n-gram shingles of a text column.

    ``greatest(..., 1)`` guards short strings: Spark's sequence() would
    otherwise generate a DESCENDING range for start > stop.
    """
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text}) - {n - 1}, 1)),"
            f" i -> substring({text}, i, {n}))"
        )
    )


@query(
    "q_llm_exact_dedup",
    oracle="""
    SELECT sha256(text) AS sha, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by sha256(text): deterministic survivor + multiplicity.

    groupBy-argmin instead of dropDuplicates: WHICH row survives subset
    dedup is nondeterministic under parallel scan order (SURVEY.md §5.3#3);
    min(doc_id) pins it on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.sha2("text", 256).alias("sha"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@query("q_llm_near_dedup")  # rows-only: LSH bucketing is engine-specific;
# recall vs exact Jaccard is asserted in tests/test_llm.py
def q_llm_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via seeded MinHash-LSH over 5-gram shingles.

    Pipeline: shingle → HashingTF (binary, 2^18 features) → MinHashLSH
    (seed 42, 6 tables) → approxSimilarityJoin at Jaccard distance ≤ 0.6.
    The join emits each candidate pair once per matching bucket, deduped by
    the framework, with the exact Jaccard distance of the hashed feature
    sets as distCol.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles("text").alias("sh")
    )
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(d)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", seed=42, numHashTables=6
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
