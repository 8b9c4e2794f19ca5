"""Registry entries for the corpus-preparation operators
(ops/corpus.py): deterministic sampling, chunking, packing, TF-IDF.

Oracle notes:
- sampling/chunking/packing are pure integer/string computations —
  bit-exact across engines by construction
- TF-IDF's ln() may differ by 1 ulp between libm implementations, so
  the exposed score is ROUND(·, 6); the rank is computed from the
  unrounded score but is stable because mathematically-equal scores
  (same tf, df) tie-break on the term string in both engines
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlpp_spark.ops import corpus as C
from sqlpp_spark.ops.hashing import HASH_MOD, hash64_sql
from sqlpp_spark.ops.text import NORMALIZE_SQL
from sqlpp_spark.queries import register, table

_NORM = NORMALIZE_SQL.format(c="text")
_KEYH = hash64_sql("'s0' || '|' || CAST(doc_id AS VARCHAR)")

_EN_RATE, _DEF_RATE = 0.2, 0.5


@register(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang FROM documents
WHERE {_KEYH} < CASE WHEN lang = 'en' THEN {int(_EN_RATE * HASH_MOD)}
                     ELSE {int(_DEF_RATE * HASH_MOD)} END
ORDER BY doc_id
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic stratified sampling (downsample 'en' to 20%,
    everything else to 50%) — same rows on every run, filter evaluates
    in the scan stage, zero shuffles."""
    d = table(spark, sf_dir, "documents")
    return (
        C.stratified_sample(
            d, rates={"en": _EN_RATE}, default_rate=_DEF_RATE,
            key_col="doc_id", stratum_col="lang",
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "corpus_chunks",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), nn AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), ch AS (
  SELECT doc_id, t, n,
         unnest(range(0, CASE WHEN n <= 64 THEN 1
                              ELSE CAST(ceil((n - 64) / 48.0) AS BIGINT) + 1
                         END)) AS chunk_id
  FROM nn
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(t[chunk_id * 48 + 1 : least(chunk_id * 48 + 64, n)], ' ')
         AS chunk_text,
       CAST(least(chunk_id * 48 + 64, n) - (chunk_id * 48 + 1) + 1 AS BIGINT)
         AS n_chunk_tokens
FROM ch
""",
)
def corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16 tokens of overlap (stride 48) — the
    context-window preparation step of a training pipeline."""
    return C.chunk_documents(
        table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


_PACK_SHARDS = 8
_SHARD = f"{hash64_sql('CAST(doc_id AS VARCHAR)')} % {_PACK_SHARDS}"

@register(
    "corpus_packing",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_SHARD} AS shard,
         CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
  FROM tok
)
SELECT doc_id, n_tokens, CAST(shard AS BIGINT) AS shard,
       CAST(floor(s / 2048) AS BIGINT) AS seq_id,
       CAST(s % 2048 AS BIGINT) AS seq_offset
FROM c
""",
)
def corpus_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy packing into 2048-token training sequences WITHIN hash
    shards — the window is partitioned so every shard packs in
    parallel (the unsharded global window serializes on one task at
    scale); sequence key = (shard, seq_id), per-shard tail waste
    < budget tokens (see ops/corpus.py pack_sequences)."""
    return C.pack_sequences(
        table(spark, sf_dir, "documents"), budget=2048, n_shards=_PACK_SHARDS
    )


@register(
    "corpus_tfidf_top_terms",
    oracle=f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), t2 AS (
  SELECT doc_id, term FROM terms WHERE length(term) >= 3
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t2 GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nd AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE)
           * ln(CAST(nd.n_docs + 1 AS DOUBLE) / CAST(dfreq.df + 1 AS DOUBLE))
           AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
)
SELECT doc_id, term, ROUND(score, 6) AS score, rank FROM (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (PARTITION BY doc_id
           ORDER BY score DESC, term ASC) AS BIGINT) AS rank
  FROM scored
) ranked
WHERE rank <= 3
""",
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf-idf (two aggregation
    shuffles + broadcast doc count + one window)."""
    out = C.tfidf_top_terms(
        table(spark, sf_dir, "documents"), top_k=3, min_len=3
    )
    return out.select(
        "doc_id", "term", F.round("score", 6).alias("score"), "rank"
    )
