"""Ported from /root/reference/dfpipeline/tests/test_map.py."""
import numpy as np
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def test_nan(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "col1": ["device-1", None, None],
        "col2": ["device-2", "device-3", None],
    }))
    m = dfp.MapTransformer(inputs=["col1", "col2"], outputs=["col1", "col2"], dict={np.nan: "missing"})
    out = m.fit_transform(df)
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device-1", "missing", "missing"],
        "col2": ["device-2", "device-3", "missing"],
    }))


def _plain(spark):
    return spark.createDataFrame(pd.DataFrame({
        "col1": ["device-1", "missing", "missing"],
        "col2": ["device-2", "device-3", "missing"],
    }))


def test_exact(spark):
    m = dfp.MapTransformer(inputs=["col1", "col2"], outputs=["col1", "col2"], dict={"device-1": "device"})
    out = m.fit_transform(_plain(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device", "missing", "missing"],
        "col2": ["device-2", "device-3", "missing"],
    }))


def test_default(spark):
    m = dfp.MapTransformer(
        inputs=["col1", "col2"], outputs=["col1", "col2"],
        dict={"device-1": "device"}, default_value="others",
    )
    out = m.fit_transform(_plain(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device", "others", "others"],
        "col2": ["others", "others", "others"],
    }))


def test_regex(spark):
    m = dfp.MapTransformer(
        inputs=["col1", "col2"], outputs=["col1", "col2"],
        dict={r".*device.*": "device"}, regex=True,
    )
    out = m.fit_transform(_plain(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device", "missing", "missing"],
        "col2": ["device", "device", "missing"],
    }))
