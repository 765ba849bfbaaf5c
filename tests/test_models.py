"""Model-boundary parity: pipeline → assemble → fit → distributed
ensemble scoring, vs the same models scored driver-side — mirroring
/root/reference/benchmarks/MLPipelineBenchmark.py:96-127 (ensemble of
classifiers, preds averaged over predict_proba[:, 1])."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import dataframe_pipeline_spark as dfp
from dataframe_pipeline_spark import features
from dataframe_pipeline_spark.models import (
    NumpyGradientBoostedStumps, NumpyLogisticRegression,
    collect_training_matrix, ensemble_proba_fn)

FEATS = ["q_s", "p_s", "d_s", "t_s"]


@pytest.fixture(scope="module")
def prepped(spark):
    """Preprocess lineitem with the pipeline, label = returnflag == 'R'."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pipe = dfp.DataframePipeline(steps=[
        dfp.Scaler(inputs=["l_quantity"], outputs=["q_s"], strategy="minmax"),
        dfp.Scaler(inputs=["l_extendedprice"], outputs=["p_s"],
                   strategy="minmax"),
        dfp.Scaler(inputs=["l_discount"], outputs=["d_s"], strategy="minmax"),
        dfp.Scaler(inputs=["l_tax"], outputs=["t_s"], strategy="minmax"),
    ])
    out = pipe.fit_transform(li).withColumn(
        "label", (F.col("l_returnflag") == "R").cast("int"))
    return out.select("l_orderkey", "l_linenumber", "label", *FEATS).cache()


@pytest.fixture(scope="module")
def ensemble(prepped):
    X, y = collect_training_matrix(prepped, FEATS, "label")
    # two ensemble members with different hyperparameters, like the
    # reference's per-fold classifiers
    m1 = NumpyLogisticRegression(lr=0.2, n_iter=300).fit(X, y)
    m2 = NumpyLogisticRegression(lr=0.1, n_iter=150, l2=0.01).fit(X, y)
    return X, y, [m1, m2]


def test_classifier_learns_signal(ensemble):
    X, y, models = ensemble
    acc = (models[0].predict(X) == y).mean()
    assert acc > 0.55  # better than the majority class alone proves signal
    proba = models[0].predict_proba(X)
    assert np.allclose(proba.sum(axis=1), 1.0)


def test_distributed_scoring_matches_driver(prepped, ensemble):
    """Arrow-batched distributed ensemble scoring == driver-side numpy
    scoring of the same rows, to floating-point round-off.  (Not
    bit-for-bit: BLAS picks a batch-size-dependent summation order for
    the matrix-vector product — observed max diff is 1 ulp.)"""
    X, y, models = ensemble
    scored = features.score_with(
        prepped, FEATS, ensemble_proba_fn(models), output="score")
    pdf = scored.orderBy("l_orderkey", "l_linenumber").toPandas()

    X_all = pdf[FEATS].to_numpy(dtype="float32")
    driver = ensemble_proba_fn(models)(X_all)
    got = pdf["score"].to_numpy()
    assert np.allclose(got, driver, rtol=0, atol=1e-12)
    assert np.abs(got - driver).max() <= 2e-16  # ≤ ~1 ulp at p∈[0,1]


def test_predict_proba_parity_both_classes(prepped, ensemble):
    _, _, models = ensemble
    m = models[0]
    scored = features.score_with(
        prepped, FEATS, lambda X: m.predict_proba(X)[:, 0], output="p0")
    scored = features.score_with(
        scored, FEATS, lambda X: m.predict_proba(X)[:, 1], output="p1")
    pdf = scored.select("p0", "p1").toPandas()
    assert np.allclose(pdf["p0"] + pdf["p1"], 1.0)


def test_scoring_plan_is_single_pass(prepped, ensemble):
    """The scoring plan is one ArrowEvalPython over the scan — no
    shuffle, no collect: the 100 TB shape."""
    _, _, models = ensemble
    scored = features.score_with(
        prepped, FEATS, ensemble_proba_fn(models), output="score")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan


def test_gbm_learns_nonlinear_signal():
    """The boosted stumps capture a non-monotone signal a linear model
    cannot: labels set inside a band |x0| <= 0.5.  Logistic (monotone in
    each feature) stays near chance; the additive-stumps GBM needs two
    opposing splits on the same feature and nails it."""
    rng = np.random.RandomState(5)
    X = rng.uniform(-1, 1, size=(2000, 2))
    y = (np.abs(X[:, 0]) <= 0.5).astype(np.float64)

    lin = NumpyLogisticRegression(lr=0.3, n_iter=300).fit(X, y)
    gbm = NumpyGradientBoostedStumps(n_rounds=80, lr=0.3).fit(X, y)
    acc_lin = (lin.predict(X) == y).mean()
    acc_gbm = (gbm.predict(X) == y).mean()
    assert acc_lin < 0.65          # band structure invisible to linear
    assert acc_gbm > 0.9
    proba = gbm.predict_proba(X)
    assert np.allclose(proba.sum(axis=1), 1.0)
    # deterministic: refit reproduces the identical model
    gbm2 = NumpyGradientBoostedStumps(n_rounds=80, lr=0.3).fit(X, y)
    assert gbm2.stumps_ == gbm.stumps_
    assert gbm2.f0_ == gbm.f0_


def test_gbm_distributed_scoring_matches_driver(prepped):
    """An actual GBM through the full model boundary — driver fit on the
    collected matrix, Arrow-batched distributed ensemble scoring via
    ensemble_proba_fn + score_with — matches driver-side scoring of the
    same rows.  This is the xgboost/lightgbm splice contract
    (reference MLPipelineBenchmark.py:96-127) proven with a real
    boosted-trees model, not just the logistic stand-in."""
    X, y = collect_training_matrix(prepped, FEATS, "label")
    gbm = NumpyGradientBoostedStumps(n_rounds=40, lr=0.3).fit(X, y)
    lin = NumpyLogisticRegression(lr=0.2, n_iter=200).fit(X, y)
    assert (gbm.predict(X) == y).mean() > 0.55   # learned real signal

    models = [gbm, lin]                          # mixed-family ensemble
    scored = features.score_with(
        prepped, FEATS, ensemble_proba_fn(models), output="score")
    pdf = scored.orderBy("l_orderkey", "l_linenumber").toPandas()
    X_all = pdf[FEATS].to_numpy(dtype="float32")
    driver = ensemble_proba_fn(models)(X_all)
    got = pdf["score"].to_numpy()
    assert np.allclose(got, driver, rtol=0, atol=1e-12)
