"""Ported from /root/reference/dfpipeline/tests/test_minority.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({"col1": ["A", "A", "A", "B", "B", "C"]}))


def test_less_than_3(spark):
    m = dfp.MinorityTransformer(inputs=["col1"], outputs=["col2"], threshold=3, replaced_to="others")
    out = m.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["A", "A", "A", "B", "B", "C"],
        "col2": ["A", "A", "A", "others", "others", "others"],
    }))


def test_less_than_2(spark):
    m = dfp.MinorityTransformer(inputs=["col1"], outputs=["col2"], threshold=2, replaced_to="others")
    out = m.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": ["A", "A", "A", "B", "B", "C"],
        "col2": ["A", "A", "A", "B", "B", "others"],
    }))
