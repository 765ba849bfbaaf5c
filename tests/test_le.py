"""Ported from /root/reference/dfpipeline/tests/test_le.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def test_le(spark):
    df = spark.createDataFrame(pd.DataFrame({"col1": ["a", "a", "b", None]}))
    le = dfp.ComplementLabelEncoder(inputs=["col1"], outputs=["col1"])
    out = le.fit_transform(df)
    # classes sorted: a=0, b=1, extra_category_=2 (NaN → extra)
    assert_frames_equal(out.select("col1"), pd.DataFrame({"col1": [0, 0, 1, 2]}))


def test_le_unseen_goes_to_extra(spark):
    fit_df = spark.createDataFrame(pd.DataFrame({"col1": ["a", "a", "b", None]}))
    test_df = spark.createDataFrame(pd.DataFrame({"col1": ["b", "zzz", None]}))
    le = dfp.ComplementLabelEncoder(inputs=["col1"], outputs=["col1"])
    out = le.fit(fit_df).transform(test_df)
    assert_frames_equal(out.select("col1"), pd.DataFrame({"col1": [1, 2, 2]}))


def test_le_parm_all(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": ["x", "y"], "b": ["q", "q"]}))
    le = dfp.ComplementLabelEncoder()
    out = le.fit_transform(df)
    # 'extra_category_' sorts before 'q'/'x'/'y' → id 0 in both columns
    assert_frames_equal(out, pd.DataFrame({"a": [1, 2], "b": [1, 1]}))
