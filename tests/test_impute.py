"""Ported from /root/reference/dfpipeline/tests/test_impute.py."""
import numpy as np
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"col1": [1, 2, 3, np.nan], "col2": [1, 3, 5, np.nan]})
    )


def test_impute_mean(spark):
    im = dfp.Imputer(inputs=["col1"], outputs=["col1"], strategy="mean")
    out = im.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [1.0, 2.0, 3.0, 2.0], "col2": [1.0, 3.0, 5.0, None],
    }))


def test_impute_median(spark):
    im = dfp.Imputer(inputs=["col2"], outputs=["col2"], strategy="median")
    out = im.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [1.0, 2.0, 3.0, None], "col2": [1.0, 3.0, 5.0, 3.0],
    }))


def test_impute_median_interpolates(spark):
    """pandas median on even counts interpolates — percentile(0.5), not approx."""
    df = spark.createDataFrame(pd.DataFrame({"c": [1.0, 2.0, 10.0, 20.0, np.nan]}))
    im = dfp.Imputer(inputs=["c"], outputs=["c"], strategy="median")
    out = im.fit_transform(df)
    assert_frames_equal(out, pd.DataFrame({"c": [1.0, 2.0, 10.0, 20.0, 6.0]}))


def test_impute_const(spark):
    im = dfp.Imputer(inputs=["col1", "col2"], outputs=["col1", "col2"], val=0)
    out = im.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [1.0, 2.0, 3.0, 0.0], "col2": [1.0, 3.0, 5.0, 0.0],
    }))
