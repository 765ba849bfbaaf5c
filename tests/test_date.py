"""Ported from /root/reference/dfpipeline/tests/test_date.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "col1": [86401, 106401, 206400, 3064000],
            "col2": ["2018-01-31", "2018-04-30", "2018-07-31", "2018-10-31"],
        })
    )


def test_seconds(spark):
    t = dfp.DateTransformer(column="col1", origin="2017-11-30")
    out = t.fit_transform(_df(spark)).select("col1_WY", "col1_DY", "col1_DW")
    assert_frames_equal(out, pd.DataFrame({
        "col1_WY": [48, 48, 48, 1],
        "col1_DY": [335, 335, 336, 4],
        "col1_DW": [4, 4, 5, 3],
    }))


def test_date(spark):
    t = dfp.DateTransformer(column="col2")
    out = t.fit_transform(_df(spark)).select("col2_MY", "col2_WY", "col2_DY", "col2_DM", "col2_DW", "col2_HD")
    assert_frames_equal(out, pd.DataFrame({
        "col2_MY": [1, 4, 7, 10],
        "col2_WY": [5, 18, 31, 44],
        "col2_DY": [31, 120, 212, 304],
        "col2_DM": [31, 30, 31, 31],
        "col2_DW": [2, 0, 1, 2],
        "col2_HD": [0, 0, 0, 0],
    }))
