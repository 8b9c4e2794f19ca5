"""Unit tests for ops/corpus.py — chunk boundary arithmetic, packing
offsets, sampling determinism, tf-idf ranking."""

from __future__ import annotations

import pytest

from sqlpp_spark.ops import corpus as C


@pytest.fixture(scope="module")
def docs(spark):
    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    return spark.createDataFrame(
        [
            (1, words(64, "a"), "en"),
            (2, words(65, "b"), "en"),
            (3, words(10, "c"), "de"),
            (4, words(200, "d"), "fr"),
        ],
        "doc_id long, text string, lang string",
    )


def test_chunk_counts_and_overlap(docs):
    out = C.chunk_documents(docs, chunk_tokens=64, overlap=16)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # exactly one chunk at 64 tokens; two at 65 (stride 48)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 64
    assert len(by_doc[2]) == 2
    # short doc: single whole-doc chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 10
    # 200 tokens: ceil((200-64)/48)+1 = 4 chunks
    assert len(by_doc[4]) == 4
    # consecutive chunks share exactly `overlap` tokens
    c0, c1 = sorted(by_doc[4], key=lambda r: r.chunk_id)[:2]
    t0, t1 = c0.chunk_text.split(" "), c1.chunk_text.split(" ")
    assert t0[-16:] == t1[:16]


def test_chunk_rejects_bad_overlap(docs):
    with pytest.raises(ValueError):
        C.chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_packing_offsets_continuous(docs):
    out = C.pack_sequences(docs, budget=100).orderBy("doc_id").collect()
    # layout: 64 | 65 | 10 | 200 at starts 0, 64, 129, 139
    assert [(r.seq_id, r.seq_offset) for r in out] == [
        (0, 0), (0, 64), (1, 29), (1, 39),
    ]
    assert [r.n_tokens for r in out] == [64, 65, 10, 200]


def test_stratified_sample_deterministic(docs):
    a = C.stratified_sample(docs, rates={"en": 1.0}, default_rate=0.0)
    b = C.stratified_sample(docs, rates={"en": 1.0}, default_rate=0.0)
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())
    assert ids_a == [1, 2]  # rate 1.0 keeps every 'en', 0.0 drops the rest


def test_hash_sample_rate(spark):
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept = C.hash_sample(big, rate=0.25, key_col="doc_id").count()
    assert 0.18 * 2000 < kept < 0.32 * 2000  # ~25% within tolerance


def test_tfidf_rank_and_min_len(spark):
    d = spark.createDataFrame(
        [
            (1, "zebra zebra zebra common xx"),
            (2, "common words here"),
            (3, "words words again"),
        ],
        "doc_id long, text string",
    )
    out = C.tfidf_top_terms(d, top_k=2, min_len=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 'xx' filtered by min_len; doc 1's top term is the repeated rare word
    top1 = sorted(by_doc[1], key=lambda r: r.rank)[0]
    assert top1.term == "zebra"
    assert all(len(r.term) >= 3 for r in out)
    assert all(r.rank in (1, 2) for r in out)


def test_split_assignment_thresholds_exact(spark, docs):
    """Cumulative-weight float accumulation must not move a split
    threshold off the literal value (0.9 + 0.05 != 0.95 in IEEE): the
    op's boundary for 'val' must equal int(0.95 * HASH_MOD) exactly,
    and every row must land in a split."""
    from sqlpp_spark.ops import corpus as C
    from sqlpp_spark.ops.hashing import HASH_MOD

    out = C.split_assignment(docs)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    # the train share of a 90/5/5 split dominates
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_temperature_mixture_shares_and_direction(spark, docs):
    """temp_share sums to 1; with 1/T = 2 the boost is monotonically
    increasing in group size (sharpening); 1/T = 1 is proportional
    (boost == 1 everywhere)."""
    from sqlpp_spark.ops.corpus import temperature_mixture

    rows = temperature_mixture(docs, group_col="lang").collect()
    assert abs(sum(r.temp_share for r in rows) - 1.0) < 1e-12
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    boosts = [r.boost for r in by_size]
    assert boosts == sorted(boosts)  # bigger group -> bigger boost
    flat = temperature_mixture(docs, group_col="lang", inv_temperature=1).collect()
    for r in flat:
        assert abs(r.boost - 1.0) < 1e-12

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mixture(docs, group_col="lang", inv_temperature=4)


def test_exact_k_sample_size_and_stability(spark, docs):
    """Exactly k per group (all rows of smaller groups); growing the
    corpus never reshuffles the relative priority of existing picks —
    survivors of the bigger corpus restricted to old rows are a prefix
    of the old picks."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.corpus import exact_k_sample

    k = 5
    sizes = {r.lang: r.n for r in docs.groupBy("lang").count()
             .withColumnRenamed("count", "n").collect()}
    picked = exact_k_sample(docs, k=k, group_col="lang").collect()
    per = {}
    for r in picked:
        per.setdefault(r.lang, set()).add(r.doc_id)
    for lang, ids in per.items():
        assert len(ids) == min(k, sizes[lang])

    # stability: the same call on half the corpus picks a superset-
    # consistent set (old picks that survive are picked again)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half_picked = {
        (r.lang, r.doc_id)
        for r in exact_k_sample(half, k=k, group_col="lang").collect()
    }
    full_ranked = {
        (r.lang, r.doc_id) for r in picked if r.doc_id % 2 == 0
    }
    # every even-id pick of the full corpus must be picked from the
    # even-only corpus too (its priority could only improve)
    assert full_ranked <= half_picked


def test_exact_k_sample_two_phase_exact_and_bounded(spark):
    """The bucketed two-phase top-k (a) yields IDENTICAL rows to the
    classic single-window formulation for any n_buckets, and (b) its
    phase-1 candidate frame is bounded by n_buckets*k rows per group —
    the scale property: no task ever sorts a whole group (a Zipf-skewed
    2000-row 'en' group never meets a window wider than B*k)."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.corpus import _exact_k_candidates, exact_k_sample

    # Zipf-ish mix: en dominates, exactly the 100 TB skew shape.
    big = spark.range(2600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 2000, F.lit("en"))
        .when(F.col("id") < 2500, F.lit("de"))
        .otherwise(F.lit("fr"))
        .alias("lang"),
    )
    k, B = 7, 16
    single = {
        (r.lang, r.doc_id)
        for r in exact_k_sample(big, k=k, group_col="lang", n_buckets=1).collect()
    }
    multi = {
        (r.lang, r.doc_id)
        for r in exact_k_sample(big, k=k, group_col="lang", n_buckets=B).collect()
    }
    assert single == multi
    assert len(multi) == 3 * k

    cand = _exact_k_candidates(
        big, k, group_col="lang", key_col="doc_id", salt="s0", n_buckets=B
    )
    per_group = {r["lang"]: r["n"] for r in
                 cand.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_group.items():
        assert n <= B * k  # phase-2 window input is O(B*k), not O(group)

    with pytest.raises(ValueError):
        exact_k_sample(big, k=k, n_buckets=0)


def test_exact_k_sample_adversarial_shapes(spark):
    """Directed edge shapes for the two-phase equivalence: groups
    smaller than k, n_buckets larger than every group, k=0, singleton
    groups, and duplicate keys (full (hash, key) ties) — each must
    yield IDENTICAL row multisets to the single-window formulation."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.corpus import exact_k_sample

    rows = (
        [(i, "tiny") for i in range(3)]          # group smaller than k
        + [(100 + i, "mid") for i in range(17)]  # mid-size
        + [(999, "one")]                         # singleton
        + [(500, "ties")] * 5                    # duplicate keys: all ties
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    for k in (0, 1, 5, 50):
        for B in (1, 3, 64, 1024):  # n_buckets >> any group size
            single = sorted(
                (r.lang, r.doc_id)
                for r in exact_k_sample(
                    df, k=k, group_col="lang", n_buckets=1
                ).collect()
            )
            multi = sorted(
                (r.lang, r.doc_id)
                for r in exact_k_sample(
                    df, k=k, group_col="lang", n_buckets=B
                ).collect()
            )
            assert single == multi, (k, B)
            if k == 0:
                assert multi == []
            else:
                per_group: dict = {}
                for g, _ in multi:
                    per_group[g] = per_group.get(g, 0) + 1
                assert per_group.get("tiny", 0) == min(k, 3)
                assert per_group.get("one", 0) == 1
                assert per_group.get("ties", 0) == min(k, 5)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(0, 120), min_size=1, max_size=4),
        k=st.integers(0, 25),
        n_buckets=st.integers(1, 200),
        salt=st.sampled_from(["s0", "zz"]),
    )
    def test_exact_k_sample_equivalence_property(spark, sizes, k, n_buckets, salt):
        """Hypothesis grid over (group sizes, k, B, salt): the bucketed
        two-phase result must equal the single-window result EXACTLY,
        and the phase-1 candidate count must respect the min(n, B*k)
        per-group bound — the proof obligation from the docstring as a
        regression guard."""
        from pyspark.sql import functions as F

        from sqlpp_spark.ops.corpus import _exact_k_candidates, exact_k_sample

        rows = [
            (g * 1000 + i, f"g{g}")
            for g, n in enumerate(sizes)
            for i in range(n)
        ]
        if not rows:
            return
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        single = sorted(
            (r.lang, r.doc_id)
            for r in exact_k_sample(
                df, k=k, group_col="lang", salt=salt, n_buckets=1
            ).collect()
        )
        multi = sorted(
            (r.lang, r.doc_id)
            for r in exact_k_sample(
                df, k=k, group_col="lang", salt=salt, n_buckets=n_buckets
            ).collect()
        )
        assert single == multi
        cand = _exact_k_candidates(
            df, k, group_col="lang", key_col="doc_id", salt=salt,
            n_buckets=n_buckets,
        )
        got = {r["lang"]: r["n"] for r in
               cand.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        for g, n in enumerate(sizes):
            assert got.get(f"g{g}", 0) <= min(n, n_buckets * k)
except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# BPE: fold encoder + iterative trainer vs a pure-Python Sennrich reference
# ---------------------------------------------------------------------------


def _py_merge_word(word_syms, merges):
    toks = list(word_syms)
    for a, b in merges:
        out = []
        for x in toks:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        toks = out
    return toks


def _py_learn(texts, k, min_count=2):
    """Reference Sennrich trainer: vocab = word->count; each iteration
    counts adjacent pairs weighted by word count, merges the argmax
    with (count desc, a asc, b asc) tie-break."""
    import re
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                vocab[w] += 1
    state = {tuple(w): n for w, n in vocab.items()}
    merges = []
    for _ in range(k):
        pc = Counter()
        for syms, n in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if cnt < min_count:
            break
        merges.append((a, b))
        nxt = {}
        for syms, n in state.items():
            out = tuple(_py_merge_word(syms, [(a, b)]))
            nxt[out] = nxt.get(out, 0) + n
        state = nxt
    return merges


def test_bpe_word_tokens_matches_reference(spark):
    from pyspark.sql import functions as F

    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "s")]
    words = ["the", "these", "aaaa", "a", "theses", "xax", "thethe"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    rows = df.select(
        "w", C.bpe_word_tokens(F.col("w"), merges).alias("t")
    ).collect()
    for r in rows:
        assert r["t"] == _py_merge_word(r["w"], merges), r["w"]


def test_bpe_learn_merges_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "these are the theses",
        "aaa aaaa the cat",
        "  MiXeD   Case\twhitespace  ",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = C.bpe_learn_merges(df, n_merges=8)
    assert got == _py_learn(texts, 8)
    # learned merges include multi-char symbols (true iteration, not
    # first-round candidates only)
    assert any(len(a) > 1 or len(b) > 1 for a, b in got)


def test_bpe_encode_counts(spark):
    df = spark.createDataFrame(
        [(1, "the cat"), (2, ""), (3, "zz qq")],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("z", "z")]
    rows = {r.doc_id: r for r in C.bpe_encode(df, merges).collect()}
    # "the cat" -> [th,e] + [c,a,t] = 5 tokens, 1 merged
    assert rows[1].n_tokens == 5 and rows[1].n_merged == 1
    # empty doc: 0 tokens (whitespace counter would say 1)
    assert rows[2].n_tokens == 0 and rows[2].n_merged == 0
    assert rows[3].n_tokens == 3 and rows[3].n_merged == 1


def test_pack_sequences_token_counter_parity(docs):
    """token_counter=None and an explicitly-passed whitespace counter
    must produce IDENTICAL packing (the parameter changes the counter,
    never the packing semantics)."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.text import normalize_text

    def ws_counter(c):
        return F.size(F.split(normalize_text(c), " ")).cast("bigint")

    base = C.pack_sequences(docs, budget=64, n_shards=4)
    param = C.pack_sequences(
        docs, budget=64, n_shards=4, token_counter=ws_counter
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, param.collect())
    )


def test_pack_sequences_bpe_counter_budgets_in_tokens(spark):
    """With a BPE counter, offsets advance by BPE token counts (words
    shrink when merges fire), and sequence budget accounting follows."""
    df = spark.createDataFrame(
        [(1, "aa aa"), (2, "aa"), (3, "bb")], "doc_id long, text string"
    )
    merges = [("a", "a"), ("b", "b")]
    out = {
        r.doc_id: r
        for r in C.pack_sequences(
            df, budget=3, token_counter=C.bpe_token_count(merges)
        ).collect()
    }
    # doc1: 2 BPE tokens (whitespace would say 2 words -> same), doc2/3: 1
    assert out[1].n_tokens == 2
    assert out[2].n_tokens == 1 and out[3].n_tokens == 1
    # global packing: offsets 0, 2, then 3 % 3 = 0 in seq 1
    assert (out[1].seq_id, out[1].seq_offset) == (0, 0)
    assert (out[2].seq_id, out[2].seq_offset) == (0, 2)
    assert (out[3].seq_id, out[3].seq_offset) == (1, 0)


def test_mixture_weights_token_counter(spark):
    df = spark.createDataFrame(
        [(1, "aa aa", "s1"), (2, "cc dd", "s2")],
        "doc_id long, text string, source string",
    )
    merges = [("a", "a")]
    rows = {
        r.source: r
        for r in C.mixture_weights(
            df, token_counter=C.bpe_token_count(merges)
        ).collect()
    }
    # s1: "aa aa" -> 2 BPE tokens; s2: "cc dd" -> 4 (no merges fire)
    assert rows["s1"].n_tokens == 2
    assert rows["s2"].n_tokens == 4


def test_shuffle_order_deterministic_and_sharded(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "doc_id long, text string"
    )
    a = {r.doc_id: (r.shard, r.rank) for r in C.shuffle_order(df).collect()}
    b = {r.doc_id: (r.shard, r.rank) for r in C.shuffle_order(df).collect()}
    assert a == b  # run-independent
    # ranks within each shard are dense 0..n_s-1
    from collections import defaultdict

    by_shard = defaultdict(list)
    for shard, rank in a.values():
        by_shard[shard].append(rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(len(ranks)))
    # adding documents never changes the relative order of existing ones
    df2 = spark.createDataFrame(
        [(i, f"t{i}") for i in range(150)], "doc_id long, text string"
    )
    c = {r.doc_id: (r.shard, r.rank) for r in C.shuffle_order(df2).collect()}
    for shard, ranks in by_shard.items():
        old = sorted(
            (a[d][1], d) for d in a if a[d][0] == shard
        )
        new_order = sorted(
            (c[d][1], d) for d in a if c[d][0] == shard
        )
        assert [d for _, d in old] == [d for _, d in new_order]


def test_dsir_importance_separates_domains(spark):
    """Docs written in the target domain's vocabulary must outscore
    out-of-domain docs, the flag must follow the score sign, and
    tokens absent from the target only drag scores down."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.corpus import dsir_importance

    rows = (
        [(i, "alpha beta gamma alpha beta", "tgt") for i in range(10)]
        + [(i + 10, "zeta eta theta zeta eta", "raw") for i in range(10)]
        + [(20, "alpha beta zeta eta", "raw")]  # mixed doc
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        r.doc_id: r
        for r in dsir_importance(
            df, target_cond=(F.col("src") == "tgt"), n_buckets=64
        ).collect()
    }
    assert out[0].dsir_score > 0 and out[0].selected
    assert out[10].dsir_score < 0 and not out[10].selected
    # the mixed doc sits strictly between the two pure domains
    assert out[10].dsir_score < out[20].dsir_score < out[0].dsir_score
    assert out[0].n_tokens == 5


def test_heavy_hitters_partitioning_independent(spark):
    """r14: the Misra-Gries candidate SUPERSET varies with batch
    boundaries, but the exact final filter makes the output identical
    under any partitioning — and equal to the brute-force answer."""
    from sqlpp_spark.ops.corpus import heavy_hitters

    rows = (
        [("hot " * 50,)] * 8
        + [(f"rare{i} word{i % 7}", ) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "text string")
    k = 20
    out1 = {
        (r.token, r.n_occurrences)
        for r in heavy_hitters(df, k=k).collect()
    }
    out2 = {
        (r.token, r.n_occurrences)
        for r in heavy_hitters(df.repartition(13), k=k).collect()
    }
    out3 = {
        (r.token, r.n_occurrences)
        for r in heavy_hitters(df.coalesce(1), k=k).collect()
    }
    assert out1 == out2 == out3
    # brute force on the same tokenization
    import pyspark.sql.functions as F

    from sqlpp_spark.ops.text import normalize_text

    toks = df.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("t")
    ).filter(F.col("t") != "")
    n = toks.count()
    brute = {
        (r.t, r.c)
        for r in toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > n // k).collect()
    }
    assert out1 == brute
    assert ("hot", 400) in out1


def test_cms_overestimates_and_is_partitioning_independent(spark):
    """Count-min property: est >= exact for EVERY probe (collisions
    only add); and the sketch is deterministic — repartitioning the
    input cannot change any estimate (late r14)."""
    from sqlpp_spark.ops.corpus import cms_counts, heavy_hitters

    rows = [("hot " * 40 + "warm " * 9 + "cold",) for _ in range(10)]
    rows += [(f"rare{i} filler words here",) for i in range(30)]
    df = spark.createDataFrame(rows, "text string")
    k = 10
    est = {r.token: r.est_n for r in cms_counts(df, d=4, w=64, k=k).collect()}
    exact = {
        r.token: r.n_occurrences
        for r in heavy_hitters(df, k=k).collect()
    }
    assert set(est) == set(exact) and exact  # probe set = heavy hitters
    for tok, e in est.items():
        assert e >= exact[tok], (tok, e, exact[tok])
    est2 = {
        r.token: r.est_n
        for r in cms_counts(df.repartition(7), d=4, w=64, k=k).collect()
    }
    assert est == est2


def test_heavy_hitters_scan_stage_total_equals_stream_count(spark):
    """r19 opt: heavy_hitters' plan-time N is now a scan-stage sum of
    per-row token counts; it must equal count(token_stream) exactly,
    including NULL / empty / whitespace-only / multi-space docs."""
    from pyspark.sql import functions as F

    from sqlpp_spark.ops.corpus import token_stream
    from sqlpp_spark.ops.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "a b  c"),
            (2, ""),
            (3, None),
            (4, "   "),
            (5, "the the the"),
        ],
        "doc_id long, text string",
    )
    narr = F.split(normalize_text(F.col("text")), " ")
    n_scan = df.select(
        F.sum(F.size(F.filter(narr, lambda t: t != F.lit("")))).alias("n")
    ).first()["n"]
    assert n_scan == token_stream(df).count() == 6
