"""Training-corpus preparation extras (round 3): decontamination, sequence
packing, stratified sampling, embedding quantization.

These are the pipeline stages that sit AROUND the cleaning/dedup core
(llm/dedup.py, llm/pipeline.py) in a real pretraining data flow:

- decontamination: drop training documents sharing any word 8-gram with a
  held-out benchmark slice (the standard n-gram-collision protocol);
- sequence packing: greedy next-fit packing of documents into fixed
  token-budget context windows — the one inherently sequential-per-group
  stage, isolated in ONE applyInPandas over bounded groups;
- stratified sampling: deterministic hash-ranked top-k per stratum (the
  reproducible alternative to rand()-based sampling — reruns and both
  engines agree exactly);
- quantization: per-vector affine int8 quantization of embeddings
  (min/max → scale/zero-point), pure array HOFs, no UDF.

Oracle discipline per SURVEY.md §5.3: the packing oracle is a DuckDB
recursive CTE replaying the same greedy fold (precedent: the
q_llm_dup_clusters oracle); quantization rounds via floor(x + 0.5) on BOTH
sides (Spark round() is HALF_UP BigDecimal, DuckDB round() is float-path —
they disagree on exact .5; floor(+0.5) is engine-identical).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from token_burn_listener_spark.registry import query
from token_burn_listener_spark.tables import load_table

# The held-out "benchmark" slice is carved deterministically from the corpus
# itself (no separate eval fixture exists): doc_id % 37 == 0 → ~2.7% of docs.
_EVAL_PRED = "doc_id % 37 = 0"


def _grams8(col: str = "text"):
    """Word 8-grams as an array column (JVM-side, no UDF).

    Texts shorter than 8 tokens emit ONE truncated gram (slice() stops at
    the array end); the oracle mirrors the guard with greatest() on the
    range bound — same convention as llm/dedup.py shingles().
    """
    return F.expr(
        f"transform(sequence(1, greatest(size(split({col}, ' ')) - 7, 1)),"
        f" i -> array_join(slice(split({col}, ' '), i, 8), ' '))"
    )


@query(
    "q_llm_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id,
             unnest([array_to_string(w[i:i+7], ' ')
                     for i in range(1, greatest(len(w) - 6, 2))]) AS gram
      FROM w
    ), eg AS (
      SELECT DISTINCT gram FROM g WHERE {_EVAL_PRED}
    ), bad AS (
      SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)
      WHERE NOT ({_EVAL_PRED.replace('doc_id', 'g.doc_id')})
    )
    SELECT doc_id, lang, source FROM documents
    WHERE NOT ({_EVAL_PRED})
      AND doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs that share NO word 8-gram
    with the held-out slice survive.

    100 TB plan: the eval side is small by construction (benchmarks are
    MBs, corpora are TBs), so its distinct gram set BROADCASTS; the train
    side explodes grams map-side and the contamination test is a broadcast
    LEFT SEMI — the exploded relation never shuffles. The final removal is
    an anti join on doc_id (contaminated ids ≪ corpus). With a benchmark
    too big to broadcast, the same plan degrades to a shuffle semi join on
    the gram hash — still no pairwise comparison anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 37 == 0
    grams = d.select("doc_id", F.explode(_grams8()).alias("gram"))
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    contaminated = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        d.filter(~is_eval)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


_PACK_BUDGET = 256


@query(
    "q_llm_pack_sequences",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ), packs AS (
      SELECT source, rn, doc_id, n_tokens,
             0::BIGINT AS pack_id, n_tokens AS fill
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.source, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.fill + t.n_tokens > {_PACK_BUDGET}
                  THEN t.n_tokens ELSE p.fill + t.n_tokens END
      FROM packs p JOIN toks t ON t.source = p.source AND t.rn = p.rn + 1
    )
    SELECT doc_id, source, n_tokens, pack_id FROM packs
    """,
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit sequence packing: per source, documents in doc_id
    order accumulate into context windows of {_PACK_BUDGET} tokens; a doc
    that would overflow starts the next pack (oversized docs get a pack of
    their own).

    The fold over each group is inherently sequential, so it runs as ONE
    applyInPandas (Arrow-batched) per group — but tokenization stays
    JVM-side: only (doc_id, source, n_tokens) enters Python, never text.

    100 TB plan: groups are bounded (a source-shard, not the corpus), and
    packing is embarrassingly parallel ACROSS groups; at real scale the
    group key becomes (source, shard) with shard = a hash/range split so
    no group exceeds one task, which changes pack boundaries only at shard
    seams — greedy packing is a per-shard streaming pass by definition.
    The oracle replays the identical fold as a DuckDB recursive CTE.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids = []
        pack_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill + n > _PACK_BUDGET and fill > 0:
                pack_id += 1
                fill = 0
            fill += n
            pack_ids.append(pack_id)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf[["doc_id", "source", "n_tokens", "pack_id"]]

    return d.groupBy("source").applyInPandas(
        pack, "doc_id long, source string, n_tokens long, pack_id long"
    )


@query(
    "q_llm_sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY sha256(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, rk FROM ranked WHERE rk <= 25
    """,
)
def q_llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sample: 25 docs per language, chosen by ranking on
    a cryptographic hash of the doc id — deterministic, uniform, and
    engine-independent (rand()-based sampling can never be oracle-checked;
    hash-ranked sampling is the reproducible production pattern).

    100 TB plan: the window partitions by stratum (bounded count), and
    rank ≤ k means each task only ever needs the k smallest hashes — at
    scale this becomes per-partition top-k + re-rank of #partitions × k
    survivors (the limit-before-rank pattern of sorts.py); the per-stratum
    window form is kept here because strata (languages) are few and the
    driver compares full output. No data-dependent skew: the hash is
    uniform by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.sha2(F.col("doc_id").cast("string"), 256), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 25)
    )


@query(
    "q_llm_quantize",
    oracle="""
    SELECT vec_id,
           round(mn, 6) AS zero_point,
           round((mx - mn) / 255.0, 9) AS scale,
           CASE WHEN mx = mn THEN [0 FOR x IN e]::BIGINT[]
                ELSE [floor((x - mn) * 255.0 / (mx - mn) + 0.5)::BIGINT
                      FOR x IN e]
           END AS q
    FROM (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             list_min(embedding::DOUBLE[]) AS mn,
             list_max(embedding::DOUBLE[]) AS mx
      FROM embeddings
    )
    """,
)
def q_llm_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector affine int8 quantization of the embedding column:
    q[i] = round((x[i] - min) / scale) with scale = (max - min)/255 —
    the storage layout ANN systems ship to disk (4× smaller than float32,
    16× smaller than the double upcast).

    Pure map-side array HOFs (transform/array_min/array_max) inside
    whole-stage codegen — no UDF, no shuffle, no state. Rounds via
    floor(x + 0.5) on BOTH engines (module docstring: Spark's HALF_UP
    BigDecimal round() vs DuckDB's float round() diverge on exact .5).
    Floats upcast to double BEFORE arithmetic so both engines fold the
    identical IEEE sequence; mx = mn (constant vector) degenerates to
    all-zero codes on both sides.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = F.expr("transform(embedding, x -> cast(x as double))")
    out = e.select(
        "vec_id",
        d.alias("e"),
        F.array_min(d).alias("mn"),
        F.array_max(d).alias("mx"),
    )
    q = F.expr(
        "CASE WHEN mx = mn THEN transform(e, x -> cast(0 as bigint)) "
        "ELSE transform(e, x -> cast(floor((x - mn) * 255.0 / (mx - mn) + 0.5)"
        " as bigint)) END"
    )
    return out.select(
        "vec_id",
        F.round("mn", 6).alias("zero_point"),
        F.round((F.col("mx") - F.col("mn")) / 255.0, 9).alias("scale"),
        q.alias("q"),
    )
