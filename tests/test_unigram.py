"""Unigram-LM tokenizer (unigram.py): distributed trainer vs the
pure-Python reference, Viterbi DP parity, partition invariance."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark import unigram as ug


CORPUS = [
    "low lower lowest low low",
    "new newer newest new newest",
    "wide wider widest wide",
    "low new wide slow slowest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string")


def test_viterbi_expr_matches_python(spark):
    scores = ug.quantized_scores(
        {"l": 3, "o": 5, "w": 4, "lo": 6, "ow": 2, "low": 8, "er": 7,
         "e": 2, "r": 2, "s": 1, "t": 1, "est": 4, "wide": 9, "i": 1,
         "d": 1, "n": 1})
    words = ["low", "lower", "lowest", "wide", "widest", "w", "neww"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: list(r.p) for r in df.select(
        "w", F.expr(ug._viterbi_expr(
            "w", ug._score_map_sql(scores), 4)).alias("p")).collect()}
    for w in words:
        assert got[w] == ug._py_viterbi(w, scores, 4), w
        assert "".join(got[w]) == w      # segmentation covers the word


def test_trainer_matches_reference(docs):
    params = dict(vocab_size=30, seed_size=80, max_piece_len=4, n_iters=2)
    tr = ug.UnigramTrainer(**params).fit(docs, "text")
    final, toks = ug.reference_unigram(CORPUS, **params)
    assert tr.counts_ == final
    got = {r.token: r.n for r in ug.UnigramTokenizer(
        tr.scores_, 4).token_counts(docs, "text").collect()}
    assert got == toks


def test_trainer_is_partition_invariant(docs):
    params = dict(vocab_size=25, seed_size=60, max_piece_len=3, n_iters=1)
    a = ug.UnigramTrainer(**params).fit(docs, "text")
    b = ug.UnigramTrainer(**params).fit(docs.repartition(13), "text")
    assert a.counts_ == b.counts_ and a.scores_ == b.scores_


def test_transform_tokens_reassemble(docs):
    tr = ug.UnigramTrainer(vocab_size=30, seed_size=80, max_piece_len=4,
                           n_iters=1).fit(docs, "text")
    out = ug.UnigramTokenizer(tr.scores_, 4).transform(docs, "text")
    for r in out.collect():
        assert "".join(r.tokens) == r.text.replace(" ", "")


def test_guards():
    with pytest.raises(ValueError):
        ug.UnigramTrainer(vocab_size=1)
    with pytest.raises(ValueError):
        ug.UnigramTrainer(vocab_size=50, seed_size=10)
    with pytest.raises(ValueError):
        ug.UnigramTokenizer({})


def test_transform_irregular_whitespace(spark):
    """Consecutive / leading / trailing spaces make split() emit empty
    words; the Viterbi expr would index element_at(acc, 0) on them
    (ADVICE r6) — they must be filtered, and the non-empty words must
    tokenize exactly as in single-spaced text."""
    tr = ug.UnigramTrainer(vocab_size=30, seed_size=80, max_piece_len=4,
                           n_iters=1).fit(spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string"), "text")
    tok = ug.UnigramTokenizer(tr.scores_, 4)
    messy = spark.createDataFrame(
        [(0, "  low  lower "), (1, "new   newest"), (2, " "), (3, "")],
        "doc_id long, text string")
    rows = {r.doc_id: list(r.tokens)
            for r in tok.transform(messy, "text").collect()}
    clean = spark.createDataFrame(
        [(0, "low lower"), (1, "new newest")], "doc_id long, text string")
    want = {r.doc_id: list(r.tokens)
            for r in tok.transform(clean, "text").collect()}
    assert rows[0] == want[0] and rows[1] == want[1]
    assert rows[2] == [] and rows[3] == []
