"""Ported from /root/reference/dfpipeline/tests/test_scale.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({"col1": [0, 1, 2], "col2": [1, 2, 3]}))


def test_minmax_scale(spark):
    s = dfp.Scaler(inputs=["col1"], outputs=["col1"], strategy="minmax")
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({"col1": [0.0, 0.5, 1.0], "col2": [1, 2, 3]}))


def test_standard_scale(spark):
    s = dfp.Scaler(inputs=["col1"], outputs=["col1"], strategy="standard")
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [-1.224744871391589, 0.0, 1.224744871391589],  # population std, ddof=0
        "col2": [1, 2, 3],
    }))


def test_min_scale(spark):
    s = dfp.Scaler(inputs=["col2"], outputs=["col2"], strategy="min")
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({"col1": [0, 1, 2], "col2": [0, 1, 2]}))
