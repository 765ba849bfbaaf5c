"""Ported from /root/reference/dfpipeline/tests/test_range.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal

SEX = ["male", "female", "female", "female", "male", "female", "male", "male", "female", "female"]
C2 = [3.0, 4.0, 6.0, 6.0, 9.0, None, 17.0, 17.0, 20.0, 100.0]
C3 = [300.0, 200.0, 100.0, 20.0, 17.0, 17.0, None, 9.0, 6.0, 6.0]


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({"sex": SEX, "C2": C2}))


def test_range1(spark):
    r = dfp.RangeTransformer(
        inputs=["C2"], outputs=["C2_norm"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "median"},
    )
    out = r.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX, "C2": C2,
        "C2_norm": [-1000.0, -1000.0, -1000.0, -1000.0, 17.0, None, 17.0, 17.0, 17.0, 1000.0],
    }))


def test_range2(spark):
    r = dfp.RangeTransformer(
        inputs=["C2"], outputs=["C2"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "median"},
    )
    out = r.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": [-1000.0, -1000.0, -1000.0, -1000.0, 17.0, None, 17.0, 17.0, 17.0, 1000.0],
    }))


def test_range2a(spark):
    r = dfp.RangeTransformer(
        inputs=["C2"], outputs=["C2"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "median", (None, None): 0},
    )
    out = r.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": [-1000.0, -1000.0, -1000.0, -1000.0, 17.0, None, 17.0, 17.0, 17.0, 1000.0],
    }))


def test_range2b(spark):
    r = dfp.RangeTransformer(
        inputs=["C2"], outputs=["C2"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "most_frequent"},
    )
    out = r.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": [-1000.0, -1000.0, -1000.0, -1000.0, 17.0, None, 17.0, 17.0, 17.0, 1000.0],
    }))


def test_range3(spark):
    r = dfp.RangeTransformer(
        inputs=["C2"], outputs=["C2"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "mean"},
    )
    out = r.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": [-1000.0, -1000.0, -1000.0, -1000.0, 15.75, None, 15.75, 15.75, 15.75, 1000.0],
    }))


def test_range4(spark):
    df2 = spark.createDataFrame(pd.DataFrame({"sex": SEX, "C2": C2, "C3": C3}))
    r = dfp.RangeTransformer(
        inputs=["C2", "C3"], outputs=["C2", "C3"],
        dict={(None, 20): 1000, (6, None): -1000, (20, 9): "mean"},
    )
    out = r.fit_transform(df2)
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": [-1000.0, -1000.0, -1000.0, -1000.0, 15.75, None, 15.75, 15.75, 15.75, 1000.0],
        "C3": [1000.0, 1000.0, 1000.0, 15.75, 15.75, 15.75, None, 15.75, -1000.0, -1000.0],
    }))
