"""BPE trainer/tokenizer: distributed-vs-reference merge parity, the
classic textbook example, native-vs-pandas tier equivalence, and the
scale-path plan (one corpus shuffle, merges on distinct words only)."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.bpe import (EOW, BpeTokenizer, BpeTrainer,
                                          reference_bpe)

CORPUS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(t,) for t in CORPUS], "text string")


def test_trainer_matches_reference(spark, corpus_df):
    trainer = BpeTrainer(n_merges=10).fit(corpus_df, "text")
    ref_merges, _ = reference_bpe(CORPUS, n_merges=10)
    assert trainer.merges_ == ref_merges
    # the classic result: 'est</w>' forms from the newest/widest cluster
    merged = {l + r for l, r, _ in trainer.merges_}
    assert "est" + EOW in merged or "est" in merged


def test_trainer_matches_reference_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    trainer = BpeTrainer(n_merges=12).fit(docs, "text")
    ref_merges, _ = reference_bpe(texts, n_merges=12)
    assert trainer.merges_ == ref_merges


def test_tokenizer_tiers_equivalent(spark, corpus_df):
    trainer = BpeTrainer(n_merges=8).fit(corpus_df, "text")
    nat = BpeTokenizer(trainer.merges_, tier="native")
    pdu = BpeTokenizer(trainer.merges_, tier="pandas")
    a = nat.transform(corpus_df, "text").select("tokens").collect()
    b = pdu.transform(corpus_df, "text").select("tokens").collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]


def test_tokenize_known_example(spark, corpus_df):
    trainer = BpeTrainer(n_merges=10).fit(corpus_df, "text")
    tok = BpeTokenizer(trainer.merges_)
    out = (tok.transform(
        spark.createDataFrame([("low lowest",)], "text string"), "text")
        .head()["tokens"])
    # 'low' was merged into a single token+EOW; 'lowest' shares 'low'+'est'
    assert "".join(out).replace(EOW, " ").split() == ["low", "lowest"]
    assert out[0] == "low" + EOW  # whole word fused after 10 merges


def test_token_counts_match_reference(spark, corpus_df):
    trainer = BpeTrainer(n_merges=6).fit(corpus_df, "text")
    tok = BpeTokenizer(trainer.merges_)
    got = {r["token"]: r["n"]
           for r in tok.token_counts(corpus_df, "text").collect()}
    # reference: tokenize every word, weight by count
    ref_merges, wf = reference_bpe(CORPUS, n_merges=6)
    pairs = [(l, r) for l, r, _ in ref_merges]
    ref_tok = BpeTokenizer(pairs, tier="pandas")  # reuse encode logic? no —
    # compute independently:
    from collections import Counter
    ranks = {p: i for i, p in enumerate(pairs)}
    def encode(w):
        syms = list(w) + [EOW]
        changed = True
        for l, r in pairs:  # sequential by rank == priority (tested above)
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i+1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return syms
    exp = Counter()
    for w, f in wf.items():
        for t in encode(w):
            exp[t] += f
    assert got == dict(exp)


def test_token_counts_single_corpus_shuffle(spark, corpus_df):
    """The scale path must aggregate words BEFORE applying merges, scan
    the corpus exactly once, and materialize the vocab-sized token
    table so the explode never drags the fold chain into the corpus
    stage (the codegen-loss regression: 71.6s vs 2.3s at sf1)."""
    trainer = BpeTrainer(n_merges=4).fit(corpus_df, "text")
    tok = BpeTokenizer(trainer.merges_)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tok.token_counts(docs, "text")
    out.collect()  # finalize AQE on THIS QueryExecution (not a writer's)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the visible plan starts at the materialized (checkpointed) token
    # table: the corpus parquet scan happened ONCE, inside that job
    assert "Scan ExistingRDD" in plan and plan.count("Scan parquet") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and the stages stay in whole-stage codegen ("*(n)" markers in the
    # finalized AQE plan string)
    assert "*(" in plan


def test_native_tier_caps_to_pandas(spark):
    merges = [(str(i), str(i + 1)) for i in range(100)]
    tok = BpeTokenizer(merges, tier="native")
    assert tok.tier == "pandas"  # silently takes the scalable tier


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([("",), (None,), ("ab ab",)], "text string")
    trainer = BpeTrainer(n_merges=2).fit(df, "text")
    tok = BpeTokenizer(trainer.merges_)
    rows = tok.transform(df, "text").select("tokens").collect()
    assert rows[0]["tokens"] == []
    assert rows[1]["tokens"] is None or rows[1]["tokens"] == []
    assert rows[2]["tokens"] == ["ab" + EOW, "ab" + EOW]


def test_fast_path_equals_distributed_path(spark):
    """The size-gated driver fast path and the distributed merge loop
    must learn the identical merge table (same tie-breaks) — forcing
    the distributed path by zeroing the gate on one instance."""
    from dataframe_pipeline_spark.bpe import BpeTrainer

    df = spark.createDataFrame(
        [("low lower lowest newest newer wide widest low low new",),
         ("slow slower slowest wide wider new newest low lowest",)],
        "text string")
    fast = BpeTrainer(n_merges=8).fit(df, "text")
    dist = BpeTrainer(n_merges=8)
    dist.FAST_VOCAB_ROWS = 0          # instance shadow: force the loop
    dist.fit(df, "text")
    assert fast.merges_ == dist.merges_
