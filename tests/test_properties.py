"""Property-based differential tests: random small frames through our
Spark operators must match the reference *semantics* computed with plain
pandas formulas (NaN→NULL normalized).  Beyond the reference's own test
suite, which is golden-frame only (SURVEY.md §5)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=list(HealthCheck))

floats = st.lists(
    st.one_of(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
              st.just(float("nan"))),
    min_size=2, max_size=12)

cats = st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12)


def _spark_floats(spark, xs):
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(xs)), "x": pd.array(xs, dtype="float64")}))


def _col(df, name):
    return {r["i"]: r[name] for r in df.collect()}


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return round(v, 9)


@given(xs=floats)
@SET
def test_scaler_minmax_matches_sklearn_formula(spark, xs):
    from dataframe_pipeline_spark import Scaler

    sdf = _spark_floats(spark, xs)
    out = _col(Scaler(inputs=["x"], outputs=["y"], strategy="minmax")
               .fit_transform(sdf), "y")
    s = pd.Series(xs)
    rng = s.max() - s.min()
    exp = (s - s.min()) * (1.0 / rng) if rng != 0 else s * 0.0
    for i, v in enumerate(xs):
        assert _norm(out[i]) == _norm(None if math.isnan(v) else exp[i])


@given(xs=floats)
@SET
def test_imputer_mean_transform_time(spark, xs):
    from dataframe_pipeline_spark import Imputer

    sdf = _spark_floats(spark, xs)
    out = _col(Imputer(inputs=["x"], outputs=["y"], strategy="mean")
               .fit_transform(sdf), "y")
    mean = pd.Series(xs).mean()   # pandas skips NaN
    for i, v in enumerate(xs):
        exp = mean if math.isnan(v) else v
        if pd.isna(exp):          # all-NaN column stays missing
            assert _norm(out[i]) is None
        else:
            assert _norm(out[i]) == _norm(exp)


@given(vals=cats)
@SET
def test_frequency_encoder_counts(spark, vals):
    from dataframe_pipeline_spark import FrequencyEncoder

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(FrequencyEncoder(inputs=["c"], outputs=["f"])
               .fit_transform(sdf), "f")
    counts = pd.Series(vals).value_counts()
    for i, v in enumerate(vals):
        assert out[i] == counts[v]


@given(vals=cats, thresh=st.integers(min_value=1, max_value=5))
@SET
def test_minority_threshold(spark, vals, thresh):
    from dataframe_pipeline_spark import MinorityTransformer

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(MinorityTransformer(inputs=["c"], outputs=["g"],
                                   threshold=thresh, replaced_to="OTHER")
               .fit_transform(sdf), "g")
    counts = pd.Series(vals).value_counts()
    for i, v in enumerate(vals):
        assert out[i] == (v if counts[v] >= thresh else "OTHER")


@given(vals=cats)
@SET
def test_label_encoder_sorted_order(spark, vals):
    from dataframe_pipeline_spark import ComplementLabelEncoder

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(ComplementLabelEncoder(inputs=["c"], outputs=["e"])
               .fit_transform(sdf), "e")
    classes = sorted(set(vals) | {"extra_category_"})
    for i, v in enumerate(vals):
        assert out[i] == classes.index(v)
