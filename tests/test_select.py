"""Ported from /root/reference/dfpipeline/tests/test_select.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal

BASE = {"col1": ["A", "B", "C"], "col2": ["L", "M", "N"], "col3": ["X", "Y", "Z"]}


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(BASE))


def test_select(spark):
    sel = dfp.ColumnSelector(columns=["col1", "col2"])
    out = sel.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({"col1": BASE["col1"], "col2": BASE["col2"]}))


def test_drop(spark):
    sel = dfp.ColumnSelector(columns=["col1"], drop=True)
    out = sel.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({"col2": BASE["col2"], "col3": BASE["col3"]}))
