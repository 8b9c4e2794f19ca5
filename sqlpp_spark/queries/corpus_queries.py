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


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_QUERIES = [
    (0, ["spark", "window"]),
    (1, ["merge", "filter", "key"]),
    (2, ["vector"]),
]

_BM25_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)


@register(
    "corpus_bm25_topk",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
), g AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM dl
), q(query_id, term) AS (VALUES {_BM25_VALUES}),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
  WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), contrib AS (
  SELECT q.query_id, tf.doc_id,
         CAST(
           ln(1.0 + (CAST(g.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5)
                    / (CAST(dfreq.df AS DOUBLE) + 0.5))
           * CAST(tf.tf AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / g.avgdl))
           AS DECIMAL(28,12)) AS c
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN g
  JOIN q ON q.term = tf.term
), scored AS (
  SELECT query_id, doc_id, SUM(c) AS score_dec FROM contrib GROUP BY 1, 2
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       ROUND(CAST(score_dec AS DOUBLE), 6) AS score, rank
FROM (
  SELECT query_id, doc_id, score_dec,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_dec DESC, doc_id
         ) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= 10
""",
)
def corpus_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 docs for three fixed keyword queries — the text
    retrieval step of a data pipeline (contamination lookup, targeted
    subset extraction). Term contributions sum as DECIMAL(28,12) so
    the score is exact and order-free (see ops/corpus.py bm25_topk)."""
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id long, term string",
    )
    return C.bm25_topk(table(spark, sf_dir, "documents"), qt, top_k=10)


_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]


@register(
    "corpus_length_deciles",
    oracle=f"""
WITH tok AS (
  SELECT lang, CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n
  FROM documents
), q AS (
  SELECT lang, quantile_cont(n, {_DECILES}) AS qs FROM tok GROUP BY 1
)
SELECT lang, CAST(r.i AS BIGINT) AS decile, ROUND(qs[r.i], 6) AS value
FROM q CROSS JOIN (SELECT unnest(range(1, 10)) AS i) r
ORDER BY lang, decile
""",
)
def corpus_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length deciles (exact, interpolated) — the
    length-distribution audit before choosing chunk/packing budgets.
    Histogram quantile (``ops/stats.py``): exact quantile_cont over
    the (lang, n_tokens) value histogram, so the shuffle is bounded by
    the token-length domain, not the corpus row count — no per-group
    row sort at 100 TB."""
    d = table(spark, sf_dir, "documents")
    from sqlpp_spark.ops.stats import quantile_cont_hist
    from sqlpp_spark.ops.text import normalize_text

    tok = d.select(
        "lang",
        F.size(F.split(normalize_text(F.col("text")), " ")).cast("bigint").alias("n"),
    )
    names = [f"__d{i}" for i in range(1, 10)]
    q = quantile_cont_hist(tok, ["lang"], "n", _DECILES, names).select(
        "lang", F.array(*names).alias("qs")
    )
    return (
        q.select(
            "lang",
            F.posexplode("qs").alias("pos", "value"),
        )
        .select(
            "lang",
            (F.col("pos") + 1).cast("bigint").alias("decile"),
            F.round("value", 6).alias("value"),
        )
        .orderBy("lang", "decile")
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity & PMI collocations
# ---------------------------------------------------------------------------

_PPL_EXPR = "exp(-(CAST(slp AS DOUBLE) / CAST(n_tokens AS DOUBLE)))"


@register(
    "text_perplexity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term FROM documents
), tot AS (SELECT COUNT(*) AS total FROM toks),
vocab AS (
  SELECT term,
         CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
                       / CAST((SELECT total FROM tot) AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS lp
  FROM toks GROUP BY term
),
per_doc AS (
  SELECT t.doc_id, SUM(v.lp) AS slp, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks t JOIN vocab v USING (term) GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       round({_PPL_EXPR}, 6) AS perplexity,
       least(CAST(floor({_PPL_EXPR} / 5.0) AS BIGINT), 19) AS bucket
FROM per_doc
""",
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-LM perplexity + mixture bucket
    (ops/corpus.py perplexity). Log-probs are decimal-rounded at the
    vocab level so the per-doc sums are exact and order-independent —
    the oracle replays the identical model."""
    return C.perplexity(table(spark, sf_dir, "documents"))


@register(
    "corpus_pmi_bigrams",
    oracle=f"""
WITH t AS (SELECT string_split({_NORM}, ' ') AS t FROM documents),
toks AS (SELECT unnest(t) AS term FROM t),
grams AS (
  SELECT array_to_string(t[i : i+1], ' ') AS ngram
  FROM t, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2
),
big AS (
  SELECT string_split(ngram, ' ')[1] AS w1, string_split(ngram, ' ')[2] AS w2,
         ngram, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM grams GROUP BY 1, 2, 3
),
uni AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY term),
nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_uni FROM toks),
nb AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_big FROM big),
scored AS (
  SELECT b.ngram, b.n_ab,
         CAST(b.n_ab AS DOUBLE) / CAST(a.n AS DOUBLE) / CAST(c.n AS DOUBLE)
           * CAST(nu.n_uni AS DOUBLE) * CAST(nu.n_uni AS DOUBLE)
           / CAST(nb.n_big AS DOUBLE) AS lift
  FROM big b JOIN uni a ON a.term = b.w1 JOIN uni c ON c.term = b.w2, nu, nb
  WHERE b.n_ab >= 5
)
SELECT ngram, n_ab, lift,
       CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, ngram ASC) AS BIGINT) AS rank
FROM scored ORDER BY lift DESC, ngram ASC LIMIT 20
""",
)
def corpus_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI lift (ops/corpus.py
    pmi_bigrams) — rank-equivalent to PMI with zero transcendentals,
    so the score itself is bit-oracled."""
    return C.pmi_bigrams(table(spark, sf_dir, "documents"))


@register(
    "corpus_bpe_merges",
    oracle=f"""
WITH words AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents
),
pairs AS (
  SELECT substring(w, CAST(i AS INT), 2) AS pair
  FROM words, unnest(range(1, length(w))) AS u(i)
  WHERE length(w) >= 2
),
counts AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair)
SELECT pair, n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank
FROM counts ORDER BY n DESC, pair ASC LIMIT 20
""",
)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training statistic: top-20 BPE merge candidates
    (adjacent character pairs within words) over the corpus
    (ops/corpus.py bpe_merge_candidates). Per-row HOF extraction, one
    partial-aggregated shuffle of (pair, count)."""
    return C.bpe_merge_candidates(table(spark, sf_dir, "documents"))


_SPLITH = hash64_sql("'split0' || '|' || CAST(doc_id AS VARCHAR)")
_SPLIT_W = (("train", 0.9), ("val", 0.05), ("test", 0.05))


@register(
    "corpus_split_assignment",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN {_SPLITH} < {int(0.9 * HASH_MOD)} THEN 'train'
            WHEN {_SPLITH} < {int(0.95 * HASH_MOD)} THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
""",
)
def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split (ops/corpus.py
    split_assignment): salted-hash thresholds, identical assignment in
    any engine and at any corpus size — adding documents never moves
    existing ones across splits. Zero shuffles."""
    return (
        C.split_assignment(
            table(spark, sf_dir, "documents"),
            weights=dict(_SPLIT_W),
        )
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    )


# -- corpus-wide top n-grams (boilerplate / contamination diagnostics) -------


@register(
    "corpus_top_ngrams",
    oracle=f"""
WITH norm AS (SELECT doc_id, {_NORM} AS s FROM documents),
toks AS (SELECT doc_id, string_split(s, ' ') AS t FROM norm),
grams AS (
  SELECT doc_id,
         array_to_string(t[CAST(g.i AS BIGINT):CAST(g.i + 2 AS BIGINT)], ' ')
           AS ngram
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)
  WHERE len(t) >= 3
)
SELECT ngram,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams GROUP BY ngram
ORDER BY n_occurrences DESC, ngram ASC
LIMIT 20
""",
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide most frequent word trigrams (ops/corpus.top_ngrams)
    — the diagnostic behind boilerplate thresholds and contamination
    screens. Deterministic tie-break on the gram string makes the
    top-k set unique, so the oracle's LIMIT agrees; Spark executes the
    global top-k as TakeOrdered (per-partition k-row partials), never a
    full sort."""
    return C.top_ngrams(table(spark, sf_dir, "documents"), n=3, top_k=20)


# -- BPE encode: apply learned merges as a tokenizer (r13) -------------------

_BPE_K = 16

# One left-to-right single-occurrence merge step, replayed to fixpoint
# per rank by the recursive CTE below. strpos/substring (never regex —
# merge symbols may contain regex metachars); the space-delimited
# symbol string makes matching symbol-exact, and single-occurrence
# replacement sidesteps the shared-boundary problem of a global
# replace (' a b a b ' — the trailing space of match 1 is the leading
# space of match 2).
_BPE_PAT = "' ' || m.a || ' ' || m.b || ' '"

_BPE_ENCODE_ORACLE = f"""
WITH RECURSIVE
w0 AS (SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents),
p0 AS (
  SELECT substring(w, CAST(i AS INT), 2) AS pair
  FROM w0, unnest(range(1, length(w))) AS u(i)
  WHERE length(w) >= 2
),
m AS (
  SELECT substring(pair, 1, 1) AS a, substring(pair, 2, 1) AS b,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank
  FROM (SELECT pair, COUNT(*) AS n FROM p0 GROUP BY pair)
  ORDER BY n DESC, pair ASC LIMIT {_BPE_K}
),
dw AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w FROM documents)
  WHERE length(w) > 0
),
enc AS (
  SELECT doc_id,
         ' ' || array_to_string(list_transform(range(1, length(w) + 1),
                 i -> substring(w, CAST(i AS INT), 1)), ' ') || ' ' AS s,
         CAST(1 AS BIGINT) AS r
  FROM dw
  UNION ALL
  SELECT e.doc_id,
         CASE WHEN strpos(e.s, {_BPE_PAT}) > 0
              THEN substring(e.s, 1, strpos(e.s, {_BPE_PAT}) - 1)
                   || ' ' || m.a || m.b || ' '
                   || substring(e.s, strpos(e.s, {_BPE_PAT})
                                     + length({_BPE_PAT}))
              ELSE e.s END AS s,
         CASE WHEN strpos(e.s, {_BPE_PAT}) > 0 THEN e.r ELSE e.r + 1 END AS r
  FROM enc e JOIN m ON m.rank = e.r
),
fin AS (
  SELECT doc_id, string_split(trim(s), ' ') AS t
  FROM enc WHERE r = {_BPE_K + 1}
),
agg AS (
  SELECT doc_id,
         CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
         CAST(SUM(len(list_filter(t, x -> length(x) >= 2))) AS BIGINT)
           AS n_merged
  FROM fin GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_merged, 0) AS BIGINT) AS n_merged
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def _bpe_merges_for(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Top-K first-iteration merge candidates in rank order — the
    data-dependent merge table both engines derive identically (same
    statistic as corpus_bpe_merges). Collect ships K 2-char strings:
    dimension-side metadata, not data."""
    rows = (
        C.bpe_merge_candidates(table(spark, sf_dir, "documents"), top_k=_BPE_K)
        .orderBy("rank")
        .collect()
    )
    return [(r["pair"][0], r["pair"][1]) for r in rows]


@register("corpus_bpe_encode", oracle=_BPE_ENCODE_ORACLE)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY (ops/corpus.py bpe_encode): learn the top-16
    merge table from the corpus (the candidate statistic already
    oracled as corpus_bpe_merges), bake it into a codegen'd fold
    expression, and emit per-doc real-token statistics. Sequential
    by-rank application == canonical greedy BPE (see bpe_word_tokens).
    Scan-stage, zero Python, zero shuffle beyond the merge-mining agg;
    the DuckDB oracle replays the same merge table with a recursive
    CTE doing leftmost single-occurrence merges to fixpoint per rank.
    The full ITERATIVE trainer (multi-char merges) is
    ops/corpus.py bpe_learn_merges, parity-pinned in tests/test_ops.py
    against a pure-Python Sennrich reference."""
    merges = _bpe_merges_for(spark, sf_dir)
    return C.bpe_encode(table(spark, sf_dir, "documents"), merges).orderBy(
        "doc_id"
    )


@register(
    "corpus_pack_bpe",
    oracle=f"""
WITH RECURSIVE
w0 AS (SELECT unnest(string_split({_NORM}, ' ')) AS w FROM documents),
p0 AS (
  SELECT substring(w, CAST(i AS INT), 2) AS pair
  FROM w0, unnest(range(1, length(w))) AS u(i)
  WHERE length(w) >= 2
),
m AS (
  SELECT substring(pair, 1, 1) AS a, substring(pair, 2, 1) AS b,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank
  FROM (SELECT pair, COUNT(*) AS n FROM p0 GROUP BY pair)
  ORDER BY n DESC, pair ASC LIMIT {_BPE_K}
),
dw AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w FROM documents)
  WHERE length(w) > 0
),
enc AS (
  SELECT doc_id,
         ' ' || array_to_string(list_transform(range(1, length(w) + 1),
                 i -> substring(w, CAST(i AS INT), 1)), ' ') || ' ' AS s,
         CAST(1 AS BIGINT) AS r
  FROM dw
  UNION ALL
  SELECT e.doc_id,
         CASE WHEN strpos(e.s, {_BPE_PAT}) > 0
              THEN substring(e.s, 1, strpos(e.s, {_BPE_PAT}) - 1)
                   || ' ' || m.a || m.b || ' '
                   || substring(e.s, strpos(e.s, {_BPE_PAT})
                                     + length({_BPE_PAT}))
              ELSE e.s END AS s,
         CASE WHEN strpos(e.s, {_BPE_PAT}) > 0 THEN e.r ELSE e.r + 1 END AS r
  FROM enc e JOIN m ON m.rank = e.r
),
agg AS (
  SELECT doc_id,
         CAST(SUM(len(string_split(trim(s), ' '))) AS BIGINT) AS n_bpe
  FROM enc WHERE r = {_BPE_K + 1} GROUP BY doc_id
),
tok AS (
  SELECT d.doc_id, {_SHARD} AS shard,
         CAST(COALESCE(a.n_bpe, 0) AS BIGINT) AS n_tokens
  FROM documents d LEFT JOIN agg a USING (doc_id)
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
def corpus_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted in REAL tokenizer tokens (r13): the
    same sharded greedy packer as corpus_packing, with n_tokens from
    the BPE encoder instead of whitespace words — a packer that budgets
    in words overfills every sequence by the corpus's words-per-token
    ratio. Same parallel window shape (shard-partitioned, waste
    < budget per shard); the token counter is a scan-stage expression,
    so the packing plan is unchanged at 100 TB."""
    merges = _bpe_merges_for(spark, sf_dir)
    return C.pack_sequences(
        table(spark, sf_dir, "documents"),
        budget=2048,
        n_shards=_PACK_SHARDS,
        token_counter=C.bpe_token_count(merges),
    )


# -- deterministic training-order shuffle (r13) ------------------------------

_SHUFH = hash64_sql("'shuf0' || '|' || CAST(doc_id AS VARCHAR)")


@register(
    "corpus_shuffle_order",
    oracle=f"""
SELECT doc_id,
       CAST({_SHUFH} % 16 AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {_SHUFH} % 16
              ORDER BY {_SHUFH} ASC, doc_id ASC) - 1 AS BIGINT) AS rank
FROM documents
ORDER BY doc_id
""",
)
def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle (ops/corpus.py shuffle_order):
    hash-sharded, hash-ranked training order — same order on every
    run/engine/resume, uncorrelated with ingest order, and no task
    sorts more than n/16 of the corpus (shard-partitioned window)."""
    return C.shuffle_order(table(spark, sf_dir, "documents")).orderBy("doc_id")


_DSIR_B = 1024


@register(
    "corpus_dsir_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         unnest(string_split({_NORM}, ' ')) AS term
  FROM documents
),
bt AS (
  SELECT doc_id, tgt, {hash64_sql("term")} % {_DSIR_B} AS b FROM toks
),
counts AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS r,
         CAST(COALESCE(SUM(CASE WHEN tgt THEN 1 ELSE 0 END), 0) AS BIGINT) AS t
  FROM bt GROUP BY b
),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS R, CAST(SUM(t) AS BIGINT) AS T FROM counts),
w AS (
  SELECT b,
         CAST(round(
           ln(CAST(t + 1 AS DOUBLE) / CAST((SELECT T FROM tot) + {_DSIR_B} AS DOUBLE))
           - ln(CAST(r + 1 AS DOUBLE) / CAST((SELECT R FROM tot) + {_DSIR_B} AS DOUBLE)),
         9) AS DECIMAL(18,9)) AS lr
  FROM counts
),
per_doc AS (
  SELECT doc_id, SUM(lr) AS slr, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM bt JOIN w USING (b) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(slr AS DOUBLE) / n_tokens, 6) AS dsir_score,
       CAST(slr AS DOUBLE) / n_tokens > 0 AS selected
FROM per_doc
""",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection toward the English subcorpus: hashed-unigram
    importance weights (target='en' rows), per-doc mean log-ratio +
    selection flag. See ops/corpus.py dsir_importance."""
    d = table(spark, sf_dir, "documents")
    return C.dsir_importance(
        d, target_cond=(F.col("lang") == "en"), n_buckets=_DSIR_B
    )


@register(
    "corpus_heavy_hitters",
    headline=True,
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE token <> ''),
tot AS (SELECT COUNT(*) AS n FROM t)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM t, tot
GROUP BY token, tot.n
HAVING COUNT(*) > tot.n // 500
ORDER BY n_occurrences DESC, token ASC
""",
)
def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens with freq > N//500) via per-batch
    Misra-Gries candidate pruning (ops/corpus.py heavy_hitters): the
    candidate pass never shuffles the vocabulary, and the exact final
    filter makes the output partitioning-independent — DuckDB
    recomputes the full exact answer, so a hash-green row proves the
    pruning lost no true heavy hitter."""
    return C.heavy_hitters(table(spark, sf_dir, "documents"), k=500)


@register(
    "corpus_cms_counts",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split({_NORM}, ' ')) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE token <> ''),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
cells AS (
  SELECT js.j AS j,
         {hash64_sql("'cms' || CAST(js.j AS VARCHAR) || '|' || t.token")} % 1024 AS b
  FROM t, js
),
sketch AS (SELECT j, b, COUNT(*) AS cnt FROM cells GROUP BY j, b),
tot AS (SELECT COUNT(*) AS n FROM t),
hh AS (
  SELECT token FROM t, tot GROUP BY token, tot.n
  HAVING COUNT(*) > tot.n // 500
),
probe AS (
  SELECT hh.token AS token, js.j AS j,
         {hash64_sql("'cms' || CAST(js.j AS VARCHAR) || '|' || hh.token")} % 1024 AS b
  FROM hh, js
)
SELECT probe.token AS token, CAST(MIN(sketch.cnt) AS BIGINT) AS est_n
FROM probe JOIN sketch ON sketch.j = probe.j AND sketch.b = probe.b
GROUP BY probe.token ORDER BY token
""",
)
def corpus_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the exact heavy-hitter
    probe set (ops/corpus.py cms_counts): a 4x1024 salted-hash counter
    matrix whose aggregation state is bounded by d*w cells regardless
    of corpus or vocabulary size; estimates are min-over-rows. The
    md5-based hash64 is engine-identical, so DuckDB rebuilds the SAME
    sketch cell-for-cell and the oracle is exact — a hash-green row
    proves both the sketch construction and the probe path."""
    return C.cms_counts(table(spark, sf_dir, "documents"), d=4, w=1024, k=500)
