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
