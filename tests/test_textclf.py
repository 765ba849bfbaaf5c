"""HashedTextClassifier: distributed full-batch logistic regression
over hashed tokens — learning on separable corpora, bit-exact
partition invariance, scoring parity with a driver-side replay."""

import math

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.textclf import HashedTextClassifier


@pytest.fixture()
def separable(spark):
    pos = [(i, f"good shiny {w}") for i, w in enumerate(
        ["alpha", "beta", "gamma", "delta"] * 3)]
    neg = [(100 + i, f"bad rusty {w}") for i, w in enumerate(
        ["alpha", "beta", "gamma", "delta"] * 3)]
    rows = [(i, t, 1) for i, t in pos] + [(i, t, 0) for i, t in neg]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_learns_separable_corpus(separable):
    clf = HashedTextClassifier(n_features=64, lr=0.5, n_iter=40)
    out = clf.fit_transform(separable, "text", "y")
    rows = out.select("y", "p_pos").collect()
    pos = [r.p_pos for r in rows if r.y == 1]
    neg = [r.p_pos for r in rows if r.y == 0]
    assert min(pos) > max(neg)            # perfect ranking
    assert min(pos) > 0.5 > max(neg)      # and thresholdable


def test_partition_invariant_weights(separable):
    a = HashedTextClassifier(n_features=64, lr=0.5, n_iter=10)
    b = HashedTextClassifier(n_features=64, lr=0.5, n_iter=10)
    a.fit(separable.repartition(2), "text", "y")
    b.fit(separable.repartition(13), "text", "y")
    assert a.w_ == b.w_ and a.b_ == b.b_  # exact, not approximate


def test_scoring_matches_driver_replay(separable):
    """transform's codegen margin equals a driver-side left-fold over
    the same hashed indices and fitted weights, bit for bit."""
    import hashlib

    clf = HashedTextClassifier(n_features=64, lr=0.5, n_iter=5)
    clf.fit(separable, "text", "y")
    got = {r.doc_id: r.p_pos
           for r in clf.transform(separable, "text").collect()}
    for row in separable.collect():
        z = clf.b_
        for tok in row.text.split():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            z = z + clf.w_[h % 64]        # same fold order as aggregate
        p = 1.0 / (1.0 + math.exp(-z))
        assert got[row.doc_id] == p, row.doc_id


def test_empty_docs_excluded_and_validation(spark, separable):
    df = spark.createDataFrame(
        [(1, "", 1), (2, "hello world", 0)], "doc_id long, text string, y int")
    clf = HashedTextClassifier(n_features=16, lr=0.1, n_iter=2)
    clf.fit(df, "text", "y")              # empty doc doesn't break fit
    assert clf.w_ is not None
    with pytest.raises(RuntimeError, match="before fit"):
        HashedTextClassifier().transform(separable)
    with pytest.raises(ValueError, match="n_features"):
        HashedTextClassifier(n_features=1)
    with pytest.raises(ValueError, match="empty"):
        HashedTextClassifier(n_features=16).fit(
            separable.filter(F.lit(False)), "text", "y")


def test_one_data_shuffle_per_iteration(separable):
    """The scoring plan is map-only (no Exchange at all)."""
    clf = HashedTextClassifier(n_features=16, lr=0.1, n_iter=1)
    clf.fit(separable, "text", "y")
    plan = (clf.transform(separable, "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


def test_broadcast_weight_path_bit_identical(separable, monkeypatch):
    """Forcing the broadcast-frame weight path (threshold 0) must fit
    bit-identical weights and score bit-identical probabilities to the
    SQL-literal path — same element_at arithmetic, different carrier."""
    import dataframe_pipeline_spark.textclf as tc

    lit = HashedTextClassifier(n_features=64, lr=0.5, n_iter=5)
    lit.fit(separable, "text", "y")
    monkeypatch.setattr(tc, "WEIGHT_LITERAL_MAX", 0)
    bc = HashedTextClassifier(n_features=64, lr=0.5, n_iter=5)
    bc.fit(separable, "text", "y")
    assert bc.w_ == lit.w_ and bc.b_ == lit.b_
    got = {r.doc_id: r.p_pos
           for r in bc.transform(separable, "text").collect()}
    want = {r.doc_id: r.p_pos
            for r in lit.transform(separable, "text").collect()}
    assert got == want
    assert "__dfp_w" not in bc.transform(separable, "text").columns


def test_fasttext_scale_vocab_plan_stays_small(separable):
    """At n_features=262144 (above WEIGHT_LITERAL_MAX) the weights ride
    as a broadcast 1-row frame: the plan text stays O(1) in n_features
    — no quarter-million-element array literal."""
    clf = HashedTextClassifier(n_features=262144, lr=0.5, n_iter=1)
    clf.fit(separable, "text", "y")
    assert len(clf.w_) == 262144
    scored = clf.transform(separable, "text")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 50_000, len(plan)   # literal path would be ~3 MB
    assert "BroadcastNestedLoopJoin" in plan  # 1-row build side, whitelisted
    rows = scored.select("y", "p_pos").collect()
    pos = [r.p_pos for r in rows if r.y == 1]
    neg = [r.p_pos for r in rows if r.y == 0]
    assert min(pos) > max(neg)             # one GD step already ranks
