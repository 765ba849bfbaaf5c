"""Text analysis operators: token counting, quality, lang-ID,
fingerprinting."""

import pytest

from dataframe_pipeline_spark import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "a of to in the and is"),
        (2, "xyzzy"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counter(docs):
    out = {r.doc_id: r for r in tx.TokenCounter().transform(docs).collect()}
    assert out[0].ws_tokens == 4
    assert out[0].re_tokens == 4
    assert out[2].ws_tokens == 1
    assert out[0].subword_est == 5  # ceil(19/4)


def test_token_counter_regex_splits_punct(spark):
    df = spark.createDataFrame([("don't stop-me now2",)], "text string")
    r = tx.TokenCounter().transform(df).first()
    # don / ' / t / stop / - / me / now / 2
    assert r.re_tokens == 8
    assert r.ws_tokens == 3


def test_quality_scorer(docs):
    out = {r.doc_id: r for r in tx.QualityScorer().transform(docs).collect()}
    r = out[1]  # all 7 tokens are stopwords
    assert r.n_tokens == 7
    assert r.stopword_ratio == 1.0
    assert r.mean_tok_len == pytest.approx((21 - 7 + 1) / 7, abs=1e-6)
    assert 0.0 <= r.quality_score <= 1.0
    assert out[0].alpha_ratio < 1.0  # spaces count against alpha ratio


def test_langid_scores_and_pred(spark):
    df = spark.createDataFrame(
        [(0, "the fox and the hen"), (1, "der hund und die katze")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in tx.LanguageIdentifier().transform(df).collect()}
    assert out[0].pred_lang == "en" and out[0].score_en == 3
    assert out[1].pred_lang == "de" and out[1].score_de == 3


def test_fingerprinter_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha"), (2, "Alpha  beta")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in tx.Fingerprinter().transform(df).collect()}
    # normalization: lowercase + whitespace collapse -> 0 and 2 agree
    assert out[0].fp_md5 == out[2].fp_md5
    assert out[0].fp_roll == out[2].fp_roll
    # rolling hash is position-weighted -> order matters
    assert out[0].fp_roll != out[1].fp_roll


def test_redactor(spark):
    import pandas as pd
    from dataframe_pipeline_spark.text import Redactor

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["mail me at jo.doe+x@foo.co.uk or 192.168.0.1",
                 "ssn 123-45-6789 call +1 555-123-4567"],
    }))
    out = {r.doc_id: r.redacted for r in Redactor().transform(df).collect()}
    assert out[0] == "mail me at <EMAIL> or <IPV4>"
    assert "<SSN>" in out[1] and "<PHONE>" in out[1]
    assert "6789" not in out[1]


def test_term_frequency(spark):
    import pandas as pd
    from dataframe_pipeline_spark.text import TermFrequency

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["a b a", "a c"]}))
    out = {r.term: (r.tf, r.df) for r in TermFrequency().transform(df).collect()}
    assert out == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}


def test_repetition_scorer(spark):
    """Gopher-style repetition: crafted docs with known bigram stats."""
    from dataframe_pipeline_spark.text import RepetitionScorer

    docs = spark.createDataFrame(
        [(0, "a b a b a b"),       # bigrams: ab ba ab ba ab -> 5 total, 2 distinct, top 'a b' = 3
         (1, "w x y z"),           # 3 bigrams, all distinct
         (2, "solo")],             # no bigrams
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           RepetitionScorer().transform(docs).collect()}
    assert (out[0].n_bigrams, out[0].distinct_bigrams) == (5, 2)
    assert out[0].dup_bigram_ratio == 0.6
    assert out[0].top_bigram_frac == 0.6          # 'a b' appears 3/5
    assert out[1].dup_bigram_ratio == 0.0
    assert out[1].top_bigram_frac == round(1 / 3, 6)
    assert (out[2].n_bigrams, out[2].dup_bigram_ratio,
            out[2].top_bigram_frac) == (0, 0.0, 0.0)


def test_contamination_checker(spark):
    from dataframe_pipeline_spark.text import ContaminationChecker

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(0, "a quick brown fox ran away"),   # shares 'quick brown fox'
         (1, "totally different words here"),
         (2, "the quick brown fox jumps high")],  # shares 3 trigrams
        "doc_id long, text string")
    out = {r.doc_id: r.n_shared for r in
           ContaminationChecker(n=3).flag(corpus, bench).collect()}
    assert out == {0: 1, 2: 3}


def test_contamination_benchmark_is_broadcast(spark):
    from dataframe_pipeline_spark.text import ContaminationChecker

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ContaminationChecker(n=3).flag(
        docs.filter("doc_id % 50 <> 0"), docs.filter("doc_id % 50 = 0"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # corpus side never shuffles


def test_chunker_short_doc_single_chunk(docs):
    out = {r.doc_id: r for r in
           tx.DocumentChunker(max_tokens=48, overlap=8)
           .transform(docs).collect()}
    assert len(out) == 3                       # one chunk per short doc
    assert out[0].chunk_id == 0
    assert out[0].chunk_text == "the quick brown fox"
    assert out[0].chunk_tokens == 4


def test_chunker_overlap_geometry(spark):
    # 10 tokens, max=4, overlap=1 -> stride 3, nchunks = ceil(6/3)+1 = 3
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(0, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(tx.DocumentChunker(max_tokens=4, overlap=1)
                  .transform(df).collect(), key=lambda r: r.chunk_id)
    assert [r.chunk_text.split(" ") for r in rows] == [
        words[0:4], words[3:7], words[6:10]]
    assert [r.chunk_tokens for r in rows] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk_text.split(" ")[-1:] == \
        rows[1].chunk_text.split(" ")[:1]


def test_chunker_tail_chunk_reaches_last_token(spark):
    # 11 tokens, max=4, overlap=1 -> stride 3, nchunks = ceil(7/3)+1 = 4
    words = [f"w{i}" for i in range(11)]
    df = spark.createDataFrame([(0, " ".join(words))],
                               "doc_id long, text string")
    rows = sorted(tx.DocumentChunker(max_tokens=4, overlap=1)
                  .transform(df).collect(), key=lambda r: r.chunk_id)
    assert len(rows) == 4
    assert rows[-1].chunk_text.split(" ")[-1] == "w10"
    assert rows[-1].chunk_tokens == 2          # tokens 9..10


def test_chunker_rejects_bad_overlap():
    with pytest.raises(ValueError):
        tx.DocumentChunker(max_tokens=4, overlap=4)


def test_chunker_no_python_udf(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (tx.DocumentChunker().transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_packer_bound_and_running_sum(spark):
    # chunks <= budget  =>  every pack <= budget + max_chunk - 1
    rows = [(0, 0, 6), (0, 1, 6), (1, 0, 4), (1, 1, 4), (1, 2, 4),
            (2, 0, 10), (3, 0, 3), (3, 1, 9)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, chunk_tokens long")
    out = tx.SequencePacker(budget=10, n_shards=1).transform(df).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r)
    max_chunk = max(t for _, _, t in rows)
    for pid, members in by_pack.items():
        assert sum(m.chunk_tokens for m in members) <= 10 + max_chunk - 1
    # pack ids are contiguous in the running order and non-decreasing
    seq = sorted(out, key=lambda r: (r.doc_id, r.chunk_id))
    run = 0
    for r in seq:
        run += r.chunk_tokens
        assert r.cum_tokens == run
        assert r.pack_id == (run - 1) // 10


def test_packer_sharding_is_doc_stable(spark):
    df = spark.createDataFrame(
        [(d, c, 5) for d in range(20) for c in range(3)],
        "doc_id long, chunk_id long, chunk_tokens long")
    out = tx.SequencePacker(budget=64, n_shards=4).transform(df).collect()
    shard_of = {}
    for r in out:
        assert 0 <= r.shard < 4
        assert shard_of.setdefault(r.doc_id, r.shard) == r.shard
    assert len({r.shard for r in out}) > 1     # hash actually spreads


def test_pack_stats_fill(spark):
    df = spark.createDataFrame(
        [(0, 0, 6), (0, 1, 6), (0, 2, 8)],
        "doc_id long, chunk_id long, chunk_tokens long")
    stats = {r.pack_id: r for r in
             tx.SequencePacker(budget=10, n_shards=1)
             .pack_stats(df).collect()}
    # cum 6, 12, 20 -> packs 0, 1, 1 (the 6-token straddler closes in 1)
    assert stats[0].pack_tokens == 6 and stats[0].n_chunks == 1
    assert stats[1].pack_tokens == 14 and stats[1].n_chunks == 2
    assert abs(stats[1].fill_ratio - 1.4) < 1e-9


def test_keep_canonical_survivors(spark):
    from dataframe_pipeline_spark import dedup as dd

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    # pairs: {0,1,2} via chain, {4,5}; 3 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in
                  dd.keep_canonical(docs, pairs).select("doc_id").collect())
    assert kept == [0, 3, 4]


def test_tfidf_matches_manual(spark):
    """tf, df, and the smoothed-idf weights against hand arithmetic."""
    import math

    rows = [(0, "cat dog cat"), (1, "cat fish"), (2, "dog dog bird")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.doc_id, r.term): (r.tf, r.tfidf)
           for r in tx.TfIdf(min_df=1).transform(df).collect()}
    n = 3

    def w(tf, dfreq):
        return round(tf * (math.log((1 + n) / (1 + dfreq)) + 1), 6)

    assert out[(0, "cat")] == (2, w(2, 2))
    assert out[(1, "cat")] == (1, w(1, 2))
    assert out[(2, "dog")] == (2, w(2, 2))
    assert out[(0, "dog")] == (1, w(1, 2))
    assert out[(1, "fish")] == (1, w(1, 1))
    assert out[(2, "bird")] == (1, w(1, 1))
    assert len(out) == 6


def test_tfidf_min_df_prunes_rare_terms(spark):
    rows = [(0, "cat dog"), (1, "cat fish")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = {r.term for r in tx.TfIdf(min_df=2).transform(df).collect()}
    assert terms == {"cat"}


def test_text_normalizer(spark):
    from dataframe_pipeline_spark.text import TextNormalizer

    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!! (x=1) "), (2, "already clean")],
        "doc_id long, text string")
    out = {r.doc_id: r.text
           for r in TextNormalizer().transform(df).collect()}
    assert out[1] == "hello world x1"
    assert out[2] == "already clean"
    # steps are independently switchable
    keep_case = TextNormalizer(lowercase=False, out_col="n").transform(df)
    assert {r.doc_id: r.n for r in keep_case.collect()}[1] == "Hello WORLD x1"
    # map-only
    plan = TextNormalizer().transform(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_scorer_hand_computed(spark):
    import math

    from dataframe_pipeline_spark.text import NgramScorer

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "z z")],
        "doc_id long, text string")
    sc = NgramScorer(k=1.0).fit(df, "text")
    # corpus tokens: a b a b a b c z z -> V=4 (a,b,c,z)
    assert sc.vocab_size_ == 4
    got = {r["doc_id"]: r["avg_logprob"]
           for r in sc.score(df, "doc_id", "text").collect()}
    # counts: cu(a)=3 cu(b)=3 cu(z)=2; cb(a,b)=3 cb(b,a)=1 cb(z,z)=1
    p_ab = (3 + 1) / (3 + 4)
    p_ba = (1 + 1) / (3 + 4)
    p_zz = (1 + 1) / (2 + 4)
    q = lambda p: round(math.log(p), 9)
    assert got[1] == round((q(p_ab) * 2 + q(p_ba)) / 3, 6)
    assert got[2] == round(q(p_ab), 6)
    assert 3 not in got                      # single token: no bigrams
    assert got[4] == round(q(p_zz), 6)


def test_ngram_scorer_unseen_tokens_score_low(spark):
    from dataframe_pipeline_spark.text import NgramScorer

    train = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    sc = NgramScorer(k=1.0).fit(train, "text")
    test = spark.createDataFrame(
        [(10, "a b a b"), (11, "q r s t")], "doc_id long, text string")
    got = {r["doc_id"]: r["avg_logprob"]
           for r in sc.score(test, "doc_id", "text").collect()}
    assert got[11] < got[10]                 # garble scores lower


def test_ngram_scorer_plan_no_python_broadcast_joins(spark):
    from dataframe_pipeline_spark.text import NgramScorer

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sc = NgramScorer().fit(docs, "text")
    plan = (sc.score(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan       # gated count-table joins


# -- BM25Retriever -----------------------------------------------------------

def test_bm25_scores_and_topk(spark):
    import math

    from dataframe_pipeline_spark.text import BM25Retriever

    rows = [(0, "spark join window"), (1, "spark spark spark spark"),
            (2, "nothing relevant here"), (3, "join the window please")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = BM25Retriever(["spark", "join"], k1=1.2, b=0.75)
    got = {x.doc_id: x.score for x in r.score(df).collect()}
    assert set(got) == {0, 1, 3}          # doc 2 matches nothing

    # replicate the formula in plain python for doc 0
    n, avgdl = 4.0, (3 + 4 + 3 + 4) / 4.0
    def part(tf, dfreq, dl):
        idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    exp0 = round(part(1, 2, 3) + part(1, 2, 3), 6)
    assert got[0] == pytest.approx(exp0, abs=1e-6)

    top = r.topk(df, 2).collect()
    assert [t.doc_id for t in top] == sorted(
        got, key=lambda d: (-got[d], d))[:2]


def test_bm25_guards():
    from dataframe_pipeline_spark.text import BM25Retriever

    with pytest.raises(ValueError):
        BM25Retriever([])
    with pytest.raises(ValueError):
        BM25Retriever(["a", "a"])


def test_bm25_null_text_excluded_from_stats(spark):
    """A NULL text row must not poison N / avgdl / df: Spark's
    size(NULL) = -1 would otherwise enter the corpus statistics with
    dl = tf = -1 (ADVICE r6) — scores must equal the null-free corpus."""
    from dataframe_pipeline_spark.text import BM25Retriever

    rows = [(0, "spark join window"), (1, "spark spark spark spark"),
            (2, "nothing relevant here"), (3, "join the window please")]
    clean = spark.createDataFrame(rows, "doc_id long, text string")
    dirty = spark.createDataFrame(rows + [(4, None)],
                                  "doc_id long, text string")
    r = BM25Retriever(["spark", "join"], k1=1.2, b=0.75)
    want = {x.doc_id: x.score for x in r.score(clean).collect()}
    got = {x.doc_id: x.score for x in r.score(dirty).collect()}
    assert got == want            # identical stats => identical scores
