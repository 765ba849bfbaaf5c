"""Ported from /root/reference/dfpipeline/tests/test_strconcat.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal

BASE = {"col1": ["A", "B", "C"], "col2": ["L", "M", "N"], "col3": ["X", "Y", "Z"]}


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(BASE))


def test_concat1(spark):
    c = dfp.StringConcatenator(inputs=[("col1",)], outputs=["col4"], separator="_")
    out = c.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": ["A", "B", "C"]}))


def test_concat2(spark):
    c = dfp.StringConcatenator(inputs=[("col1", "col2")], outputs=["col4"], separator="_")
    out = c.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": ["A_L", "B_M", "C_N"]}))


def test_concat3(spark):
    c = dfp.StringConcatenator(inputs=[("col1", "col2", "col3")], outputs=["col4"], separator="_")
    out = c.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": ["A_L_X", "B_M_Y", "C_N_Z"]}))


def test_concat_float_strip_quirk(spark):
    """The reference strips trailing '0' then '.' from every stringified
    operand (StringConcatenator.py transform): 900.0→'9', 120.5→'120.5',
    100.0→'100'... precisely: rstrip('0') strips ALL trailing zeros."""
    df = spark.createDataFrame(pd.DataFrame({
        "a": [900.0, 120.5, 100.25], "b": ["x", "y", "z"],
    }))
    c = dfp.StringConcatenator(inputs=[("a", "b")], outputs=["out"], separator="_")
    out = c.fit_transform(df).select("out")
    # str(900.0)='900.0' →rstrip0→ '900.' →rstrip.→ '900'
    # str(120.5)='120.5' (no trailing 0/.)  str(100.25)='100.25'
    assert_frames_equal(out, pd.DataFrame({"out": ["900_x", "120.5_y", "100.25_z"]}))
