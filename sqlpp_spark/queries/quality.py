"""Text-quality and corpus-hygiene registry entries (round 2):
Gopher-style rule filtering, within-document repetition signals,
CCNet-style common-span boilerplate removal, and corpus-wide n-gram
counts. The reference has no text operators (it is a typed-SQL
compiler — see SURVEY.md §2); these extend the training-data-pipeline
surface alongside ops/dedup.py and ops/corpus.py.

Determinism contract: every ratio is a single IEEE division of exact
integer counts (bit-equal across engines, no rounding needed); every
LIMIT carries a total-order tiebreak; reassembled text is joined in
explicit ``ord`` order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlpp_spark.ops import corpus as C
from sqlpp_spark.ops import text as X
from sqlpp_spark.queries import register, table

_NORM = X.NORMALIZE_SQL.format(c="text")

_G = X.gopher_stats_sql("text")


@register(
    "text_gopher_quality",
    oracle=f"""
SELECT doc_id,
       {_G['n_words']} AS n_words,
       {_G['mean_word_len']} AS mean_word_len,
       {_G['distinct_ratio']} AS distinct_ratio,
       {_G['gopher_pass']} AS gopher_pass
FROM documents
ORDER BY doc_id
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style rule filter: word-count band, mean-
    word-length band, lexical-diversity floor — all per-row scan-stage
    expressions (zero shuffles; the orderBy exists for the oracle)."""
    return X.gopher_stats(table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "text_repetition",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w FROM documents
), per_word AS (
  SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
), agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS max_count
  FROM per_word GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct,
       (CAST(n_words AS DOUBLE) - n_distinct) / CAST(n_words AS DOUBLE)
         AS dup_word_frac,
       max_count / CAST(n_words AS DOUBLE) AS top_word_share
FROM agg ORDER BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: duplicate-word fraction + top-word
    share (the Gopher repetition signals), via two partially-aggregated
    narrow shuffles — see ops/text.repetition_stats for the CPU trade."""
    return X.repetition_stats(table(spark, sf_dir, "documents")).orderBy("doc_id")


_SPAN_K, _SPAN_MIN_DOCS = 3, 3


@register(
    "dedup_common_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS ord,
         array_to_string(t[i*{_SPAN_K}+1 : (i+1)*{_SPAN_K}], ' ') AS span
  FROM toks, unnest(range(0, CAST(ceil(len(t)/{_SPAN_K}.0) AS BIGINT))) AS u(i)
  WHERE len(t) > 0
), common AS (
  SELECT span FROM (
    SELECT span, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY span
  ) WHERE nd >= {_SPAN_MIN_DOCS}
), marked AS (
  SELECT s.doc_id, s.ord, s.span, (c.span IS NOT NULL) AS is_common
  FROM spans s LEFT JOIN common c ON s.span = c.span
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(is_common::INT) AS BIGINT) AS n_dropped,
       COALESCE(string_agg(CASE WHEN NOT is_common THEN span END, ' ' ORDER BY ord), '')
         AS clean_text
FROM marked
GROUP BY doc_id
HAVING CAST(SUM(is_common::INT) AS BIGINT) < CAST(COUNT(*) AS BIGINT)
ORDER BY doc_id
""",
)
def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style shared-boilerplate removal: drop every {k}-word span
    occurring in >= {m} distinct documents, reassemble the survivors in
    order. Occurrence counting runs over span hashes; the thresholded
    common set broadcasts; text shuffles exactly once (reassembly)."""
    return C.strip_common_spans(
        table(spark, sf_dir, "documents"),
        span_tokens=_SPAN_K, min_docs=_SPAN_MIN_DOCS,
    ).orderBy("doc_id")


@register(
    "corpus_bigram_top",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT array_to_string(t[i : i+1], ' ') AS ngram
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams GROUP BY ngram
ORDER BY n DESC, ngram ASC
LIMIT 20
""",
)
def corpus_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (LM-analysis staple): overlapping
    bigrams via the codegen explode+slice idiom, one partially-
    aggregated groupBy on short strings, total-order tiebreak."""
    grams = C.word_ngrams(table(spark, sf_dir, "documents"), n=2)
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(20)
    )


_DECON_K, _DECON_MOD = 4, 23


@register(
    "corpus_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i : i+{_DECON_K}-1], ' ') AS ngram
  FROM toks, unnest(range(1, len(t)-{_DECON_K}+2)) AS u(i)
  WHERE len(t) >= {_DECON_K}
), bench AS (
  SELECT DISTINCT ngram FROM grams WHERE doc_id % {_DECON_MOD} = 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
FROM (SELECT DISTINCT doc_id, ngram FROM grams WHERE doc_id % {_DECON_MOD} != 0)
WHERE ngram IN (SELECT ngram FROM bench)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any {k}-gram
    with the held-out benchmark slice (doc_id % {m} == 0 stands in for
    an eval suite). The benchmark gram set broadcasts; the training
    side never shuffles text — see ops/corpus.contamination."""
    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    bench = d.filter(F.col("doc_id") % _DECON_MOD == 0)
    return C.contamination(train, bench, n=_DECON_K).orderBy("doc_id")


@register(
    "corpus_mixture_weights",
    oracle=f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS ngroups
  FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
       CAST(total AS DOUBLE) / CAST(ngroups * n_tokens AS DOUBLE) AS mix_weight
FROM per, tot
ORDER BY source
""",
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture table per source: token share of the corpus and
    the uniform-target resampling weight — the bookkeeping step before
    weighted interleaving of training shards."""
    return C.mixture_weights(table(spark, sf_dir, "documents"), group_col="source").orderBy(
        "source"
    )


@register(
    "corpus_temperature_mixture",
    oracle=f"""
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS total_p
  FROM per
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS token_share,
       CAST(n_tokens * n_tokens AS DOUBLE) / CAST(total_p AS DOUBLE)
         AS temp_share,
       (CAST(n_tokens * n_tokens AS DOUBLE) / CAST(total_p AS DOUBLE))
         / (CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) AS boost
FROM per, tot
ORDER BY source
""",
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture shares (share ∝ token_share^(1/T);
    here T=0.5, i.e. exact integer squares, sharpening toward
    high-resource groups — the same power rule multilingual
    pretraining tunes in the other direction to lift low-resource
    languages). boost feeds stratified_sample as per-group rates."""
    return C.temperature_mixture(
        table(spark, sf_dir, "documents"), group_col="source"
    ).orderBy("source")


def _exact_k_oracle(k: int = 20) -> str:
    from sqlpp_spark.ops.hashing import hash64_sql

    h = hash64_sql("concat('s0', '|', CAST(doc_id AS VARCHAR))")
    return f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY {h} ASC, doc_id ASC) AS rk
  FROM documents
) WHERE rk <= {k}
"""


@register("corpus_exact_k_sample", oracle=_exact_k_oracle())
def corpus_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exactly-k-per-group sample (20 docs per lang) —
    the fixed-size eval-set construction rate-based sampling can't
    guarantee; salted-hash priority makes picks stable under corpus
    growth."""
    d = table(spark, sf_dir, "documents")
    return C.exact_k_sample(d, k=20, group_col="lang").select("doc_id", "lang")


_CLF = X.classifier_sql("text")


@register(
    "text_quality_classifier",
    oracle=f"""
SELECT doc_id, lang,
       CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens,
       {_CLF['logit']} AS logit,
       {_CLF['score']} AS score,
       {_CLF['keep']} AS keep
FROM documents
ORDER BY doc_id
""",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (ops/text.py classify_quality):
    a pretrained linear classifier evaluated row-wise in the scan
    stage — the FineWeb/CCNet "quality model" stage with the learned
    weights inlined as plan literals. Zero shuffles; at 100 TB this is
    a pure map over the corpus scan, and the keep flag tests the
    bit-exact logit (not the rounded sigmoid) so the decision is
    engine-independent."""
    return X.classify_quality(table(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "text_length_percentiles",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars,
       quantile_cont(n_chars, 0.99) AS p99_chars
FROM documents GROUP BY lang
""",
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentiles — the distribution scan
    behind length-filter thresholds. Computed with the histogram
    quantile (``ops/stats.py quantile_cont_hist``): exact,
    bit-equal to DuckDB's quantile_cont, and — unlike ``F.percentile``,
    which buffers and sorts every row of a group in one aggregation
    buffer — the shuffle carries only distinct (lang, n_chars) counts,
    so the plan survives 100 TB without a per-group row sort."""
    from sqlpp_spark.ops.stats import quantile_cont_hist

    d = table(spark, sf_dir, "documents")
    return quantile_cont_hist(
        d,
        ["lang"],
        "n_chars",
        [0.5, 0.9, 0.99],
        ["p50_chars", "p90_chars", "p99_chars"],
        count_name="n_docs",
    ).select("lang", "n_docs", "p50_chars", "p90_chars", "p99_chars")


def _temperature_resample_oracle(base_rate: float = 0.3) -> str:
    from sqlpp_spark.ops.hashing import HASH_MOD, hash64_sql

    h = hash64_sql("concat('s0', '|', CAST(doc_id AS VARCHAR))")
    return f"""
WITH per AS (
  SELECT lang,
         CAST(SUM(len(string_split({_NORM}, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS total_p
  FROM per
), rates AS (
  SELECT lang,
         least(1.0, {base_rate!r} * (
           (CAST(n_tokens * n_tokens AS DOUBLE) / CAST(total_p AS DOUBLE))
           / (CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)))) AS rate
  FROM per, tot
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r USING (lang)
WHERE {h} < CAST(r.rate * {HASH_MOD} AS BIGINT)
"""


@register("corpus_temperature_resample", oracle=_temperature_resample_oracle())
def corpus_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END temperature resampling (the mT5/XLM-R loop closed):
    per-language mixture boosts (share ∝ token_share², T=0.5) become
    per-stratum deterministic sampling rates (rate = min(1, 0.3·boost))
    fed straight into ``stratified_sample``. The boost table is
    group-cardinality-sized — collected once at plan-build time and
    baked into the sampling predicate as literals (the same
    broadcast-sized-metadata pattern as pivot centroids); the sample
    itself is a scan-stage hash filter, zero shuffles. Bit-equal to the
    oracle because boosts are exact integer-power ratios and the
    rate→threshold conversion is the same IEEE multiply+truncate in
    both engines."""
    d = table(spark, sf_dir, "documents")
    w = C.temperature_mixture(d, group_col="lang", inv_temperature=2)
    rates = {
        r["lang"]: min(1.0, 0.3 * r["boost"]) for r in w.collect()
    }
    return C.stratified_sample(
        d, rates, default_rate=0.3, stratum_col="lang"
    ).select("doc_id", "lang")

