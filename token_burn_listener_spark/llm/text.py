"""B10 — text analytics for training-data pipelines (SURVEY.md §2.B10).

Tokenization here is plain SQL ``split`` (whitespace corpus fixture), so
every operator except the hash-based TF-IDF stays exactly oracle-checkable.
All shapes are the standard corpus-prep passes: token stats, document
frequency, n-grams, quality filtering, per-slice corpus stats.

Scale notes (100 TB): explode multiplies rows ~60× here (tokens/doc), so
each aggregation is partial+final on (small-cardinality) token keys —
map-side combine collapses the blow-up before the shuffle. The quality
filter is a pure scan-side predicate (pushdown-friendly). Nothing collects
to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table

def _tokens():
    """Lazy: building a Column requires an active SparkContext."""
    return F.split("text", " ")


@query(
    "q_llm_tokenize",
    oracle="""
    WITH tok AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT lang, count(*) AS n_tokens,
           count(DISTINCT token) AS n_distinct_tokens,
           count(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY lang
    """,
)
def q_llm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-language token statistics."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", "doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "q_llm_term_stats",
    oracle="""
    WITH tok AS (
      SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    df AS (SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token),
    tc AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY source, token),
    ranked AS (
      SELECT tc.source, tc.token, tc.cnt, df.doc_freq,
             row_number() OVER (PARTITION BY tc.source
                                ORDER BY tc.cnt DESC, tc.token) AS rnk
      FROM tc JOIN df USING (token)
    )
    SELECT source, token, cnt, doc_freq, rnk FROM ranked WHERE rnk <= 5
    """,
)
def q_llm_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per source with corpus-wide document frequency.

    The TF-IDF precursor, exact: per-(source, token) counts, corpus df via
    a broadcastable (token, doc_freq) dim, per-source top-k via a
    partitioned rank window (WindowGroupLimit prunes at scale).
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", "doc_id", F.explode(_tokens()).alias("token"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    tc = tok.groupBy("source", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "token")
    return (
        tc.join(F.broadcast(df_), "token")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "token", "cnt", "doc_freq", "rnk")
    )


@query("q_llm_tfidf")  # rows-only: HashingTF bucket ids are engine-specific
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via HashingTF + IDF (hash-based, so no cross-engine oracle).

    Emits per-doc summary stats of the tf-idf vector (nnz, L2 norm) rather
    than raw bucket ids, keeping the output stable under rehashing.
    """
    from pyspark.ml.feature import IDF, HashingTF
    from pyspark.ml.functions import vector_to_array

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=4096)
    tfd = tf.transform(d)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfd)
    arr = vector_to_array(F.col("tfidf"))
    return idf.transform(tfd).select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x != 0)).cast("long").alias("nnz"),
        F.round(
            F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("l2_norm"),
    )


@query(
    "q_llm_ngrams",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             unnest(range(len(string_split(text, ' ')))) AS i
      FROM documents
    )
    SELECT a.w || ' ' || b.w AS bigram, count(*) AS cnt
    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    GROUP BY 1
    """,
)
def q_llm_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigram counts, array-native (no self-join on the Spark side).

    The bigram array is built in-row with transform(sequence(...)) — the
    oracle's positional self-join computes the same pairs relationally.
    pyspark.ml.feature.NGram produces the identical result; the SQL
    formulation is used so the key stays exactly oracle-checkable.
    """
    d = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) > 1 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 1),"
        "   i -> concat(element_at(split(text, ' '), i), ' ',"
        "               element_at(split(text, ' '), i + 1)))"
        " ELSE array() END"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_llm_text_filter",
    oracle="""
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
    WHERE lang <> 'zh'
      AND n_chars BETWEEN 80 AND 500
      AND len(string_split(text, ' ')) >= 15
      AND n_chars::DOUBLE / len(string_split(text, ' ')) <= 8.0
    """,
)
def q_llm_text_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filtering: language, length bounds, token count, avg word len.

    The canonical corpus-cleaning predicate stack — all scan-side, no
    shuffle; at 100 TB this is a pushed-down filter over the whole corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return (
        d.filter(
            (F.col("lang") != "zh")
            & F.col("n_chars").between(80, 500)
            & (n_tokens >= 15)
            & (F.col("n_chars") / n_tokens <= 8.0)
        )
        .select("doc_id", "lang", "n_chars", n_tokens.cast("long").alias("n_tokens"))
    )


@query(
    "q_llm_doc_stats",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           sum(n_chars) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
    FROM documents GROUP BY lang, source
    """,
)
def q_llm_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus analytics per (lang, source): counts, char volume, percentiles."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.percentile("n_chars", 0.9), 6).alias("p90_chars"),
    )
