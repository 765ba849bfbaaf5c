"""Ported from /root/reference/dfpipeline/tests/test_freq.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"col1": ["device-1", "device-1", "device-2", "device-2"]})
    )


def test_freq(spark):
    fe = dfp.FrequencyEncoder(inputs=["col1"], outputs=["col2"])
    out = fe.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device-1", "device-1", "device-2", "device-2"],
        "col2": [2, 2, 2, 2],
    }))


def test_norm_freq(spark):
    fe = dfp.FrequencyEncoder(inputs=["col1"], outputs=["col2"], normalize=True)
    out = fe.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device-1", "device-1", "device-2", "device-2"],
        "col2": [0.5, 0.5, 0.5, 0.5],
    }))


def test_freq_unseen_defaults(spark):
    """Unseen at transform → 1 (counts) / 0.0 (normalized), per the reference."""
    fit_df = _df(spark)
    test_df = spark.createDataFrame(pd.DataFrame({"col1": ["device-1", "device-9"]}))

    fe = dfp.FrequencyEncoder(inputs=["col1"], outputs=["col2"])
    out = fe.fit(fit_df).transform(test_df)
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device-1", "device-9"], "col2": [2, 1],
    }))

    fe = dfp.FrequencyEncoder(inputs=["col1"], outputs=["col2"], normalize=True)
    out = fe.fit(fit_df).transform(test_df)
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["device-1", "device-9"], "col2": [0.5, 0.0],
    }))
