"""TargetEncoder (smoothed mean encoding), HashingEncoder, and the
robust Scaler strategy."""

import math

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.operators import (
    HashingEncoder, Scaler, TargetEncoder)


@pytest.fixture()
def labeled(spark):
    # cat a: 3 rows target mean 10; cat b: 1 row target 100; global 32.5
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "a", 10.0), (4, "b", 100.0)],
        "id long, cat string, y double")


def test_target_encode_smoothing(spark, labeled):
    enc = TargetEncoder(inputs=["cat"], outputs=["code"], target="y",
                        smoothing=2.0)
    out = enc.fit_transform(labeled)
    got = {r.id: r.code for r in out.collect()}
    g = 32.5
    code_a = (3 * 10.0 + 2.0 * g) / (3 + 2.0)
    code_b = (1 * 100.0 + 2.0 * g) / (1 + 2.0)
    assert math.isclose(got[1], code_a) and math.isclose(got[4], code_b)
    # small category shrinks harder toward the global mean
    assert abs(code_b - g) / abs(100.0 - g) < 1.0
    assert abs(got[1] - 10.0) < abs(got[4] - 100.0)


def test_target_encode_unseen_and_null_get_global(spark, labeled):
    enc = TargetEncoder(inputs=["cat"], outputs=["code"], target="y",
                        smoothing=2.0).fit(labeled)
    new = spark.createDataFrame(
        [(9, "zzz", 0.0), (10, None, 0.0)], "id long, cat string, y double")
    got = {r.id: r.code for r in enc.transform(new).collect()}
    assert math.isclose(got[9], 32.5) and math.isclose(got[10], 32.5)


def test_target_encode_zero_smoothing_is_plain_mean(spark, labeled):
    enc = TargetEncoder(inputs=["cat"], outputs=["code"], target="y",
                        smoothing=0.0)
    got = {r.id: r.code for r in enc.fit_transform(labeled).collect()}
    assert math.isclose(got[1], 10.0) and math.isclose(got[4], 100.0)


def test_target_encode_validation(spark, labeled):
    with pytest.raises(ValueError, match="target"):
        TargetEncoder(inputs=["cat"], outputs=["c"])
    with pytest.raises(ValueError, match="smoothing"):
        TargetEncoder(inputs=["cat"], outputs=["c"], target="y",
                      smoothing=-1)
    with pytest.raises(RuntimeError, match="before fit"):
        TargetEncoder(inputs=["cat"], outputs=["c"],
                      target="y").transform(labeled)


def test_hashing_encoder(spark):
    df = spark.createDataFrame(
        [(1, "url-a"), (2, "url-b"), (3, "url-a"), (4, None)],
        "id long, u string")
    enc = HashingEncoder(inputs=["u"], outputs=["b"], n_buckets=8)
    got = {r.id: r.b for r in enc.transform(df).collect()}
    assert got[1] == got[3]                      # same value, same bucket
    assert 0 <= got[1] < 8 and 0 <= got[2] < 8
    assert got[4] is None                        # NULL stays NULL
    # stateless + map-only
    plan = enc.transform(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="n_buckets"):
        HashingEncoder(inputs=["u"], outputs=["b"], n_buckets=1)


def test_scaler_robust_zero_iqr(spark):
    df = spark.createDataFrame([(5.0,)] * 4, "x double")
    out = Scaler(inputs=["x"], outputs=["y"],
                 strategy="robust").fit_transform(df)
    assert all(r.y == 0.0 for r in out.collect())   # divisor 1, x - median


def test_scaler_robust_matches_sklearn_formula(spark):
    import numpy as np
    vals = [float(v) for v in range(1, 51)] + [500.0]   # one outlier
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    sc = Scaler(inputs=["x"], outputs=["y"], strategy="robust").fit(df)
    md = np.percentile(vals, 50)
    iqr = np.percentile(vals, 75) - np.percentile(vals, 25)
    assert math.isclose(sc.offsets[0], md)
    assert math.isclose(1.0 / sc.scales[0], iqr)


def test_target_encode_transform_is_job_free(spark, labeled):
    """Cardinality is resolved at fit: building the transform plan must
    launch zero Spark jobs (serving-path contract)."""
    enc = TargetEncoder(inputs=["cat"], outputs=["code"], target="y",
                        smoothing=2.0).fit(labeled)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    _ = enc.transform(labeled)            # plan construction only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_cv_target_encode_is_leakage_free(spark):
    """The defining property: a row's own target must NOT move its own
    code.  Perturb one row's target; only rows in the SAME fold and
    category may change — the perturbed row's own code stays fixed."""
    from dataframe_pipeline_spark.operators import CVTargetEncoder

    rows = [(i, "a", 10.0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    enc = lambda d: CVTargetEncoder(
        inputs=["cat"], outputs=["code"], target="y", fold_key="id",
        cv_folds=3, smoothing=0.0).fit_transform(d)
    base = {r.id: r.code for r in enc(df).collect()}
    # perturb row 0's target hugely
    df2 = spark.createDataFrame(
        [(0, "a", 1e6)] + rows[1:], "id long, cat string, y double")
    pert = {r.id: r.code for r in enc(df2).collect()}
    assert abs(pert[0] - base[0]) < 1e-9        # own code untouched
    # rows in OTHER folds see the perturbation (it is in their OOF set)
    moved = [i for i in base if abs(pert[i] - base[i]) > 1.0]
    assert moved and 0 not in moved


def test_cv_target_encode_oof_arithmetic(spark):
    """3 folds, smoothing 0: each row's code == mean of the other
    folds' targets for its category."""
    from dataframe_pipeline_spark.operators import CVTargetEncoder

    # construct ids whose md5-fold is known by computing it in python
    import hashlib

    def fold(i, k=3):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % k

    rows = [(i, "a", float(100 + fold(i))) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {r.id: r.code for r in CVTargetEncoder(
        inputs=["cat"], outputs=["code"], target="y", fold_key="id",
        cv_folds=3, smoothing=0.0).fit_transform(df).collect()}
    import statistics
    for i, _, _ in rows[:10]:
        others = [y for j, _, y in rows if fold(j) != fold(i)]
        assert abs(out[i] - statistics.mean(others)) < 1e-9


def test_cv_target_encode_single_fold_category_gets_global(spark):
    from dataframe_pipeline_spark.operators import CVTargetEncoder

    # category 'solo' appears once -> no OOF evidence -> global mean
    df = spark.createDataFrame(
        [(i, "a", 10.0) for i in range(20)] + [(99, "solo", 500.0)],
        "id long, cat string, y double")
    out = {r.id: r.code for r in CVTargetEncoder(
        inputs=["cat"], outputs=["code"], target="y", fold_key="id",
        cv_folds=4, smoothing=0.0).fit_transform(df).collect()}
    gm = (10.0 * 20 + 500.0) / 21
    assert abs(out[99] - gm) < 1e-9


def test_cv_target_encode_validation(spark):
    from dataframe_pipeline_spark.operators import CVTargetEncoder
    with pytest.raises(ValueError, match="fold_key"):
        CVTargetEncoder(inputs=["c"], outputs=["o"], target="y")
    with pytest.raises(ValueError, match="cv_folds"):
        CVTargetEncoder(inputs=["c"], outputs=["o"], target="y",
                        fold_key="id", cv_folds=1)
