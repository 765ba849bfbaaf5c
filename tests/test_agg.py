"""Golden-frame tests ported from /root/reference/dfpipeline/tests/test_agg.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "col1": [2, 2, 4, 4],
            "col2": ["device-1", "device-1", "device-2", "device-2"],
        })
    )


def test_mean(spark):
    agg = dfp.Aggregator(inputs=["col1"], outputs=["mean"], func="mean")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "mean": [3.0, 3.0, 3.0, 3.0],
    }))


def test_groupby_mean(spark):
    agg = dfp.Aggregator(inputs=["col1"], outputs=["mean_to_col2"], groupby=["col2"], func="mean")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "mean_to_col2": [2.0, 2.0, 4.0, 4.0],
    }))


def test_groupby_count(spark):
    agg = dfp.Aggregator(inputs=["col2"], outputs=["count"], groupby=["col2"], func="count")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "count": [2, 2, 2, 2],
    }))


def test_groupby_std_unseen_key(spark):
    """Transform on a frame containing a key unseen at fit → NULL (pandas map miss)."""
    agg = dfp.Aggregator(inputs=["col1"], outputs=["std_to_col2"], groupby=["col2"], func="std")
    agg.fit(_df(spark))
    test = spark.createDataFrame(
        pd.DataFrame({"col1": [1, 1], "col2": ["device-1", "device-9"]})
    )
    out = agg.transform(test)
    assert_frames_equal(out, pd.DataFrame({
        "col1": [1, 1],
        "col2": ["device-1", "device-9"],
        "std_to_col2": [0.0, None],
    }))
