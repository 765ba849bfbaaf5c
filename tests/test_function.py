"""Ported from /root/reference/dfpipeline/tests/test_function.py."""
import numpy as np
import pandas as pd

import dataframe_pipeline_spark as dfp
import dataframe_pipeline_spark.functions as dfn
from tests.conftest import assert_frames_equal

BASE = {
    "col1": [1, 2, 3, 4],
    "col2": [10, 20, 30, 40],
    "col3": [1, 4, 9, 16],
}


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(BASE))


def test_add_constant(spark):
    f = dfp.FunctionTransformer(inputs=["col1"], outputs=["col4"], func=lambda x: x + 1)
    out = f.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": [2, 3, 4, 5]}))


def test_add_two_columns(spark):
    f = dfp.FunctionTransformer(inputs=[("col1", "col2")], outputs=["col4"], func=lambda x, y: x + y)
    out = f.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": [11, 22, 33, 44]}))


def test_np_sqrt(spark):
    """np.sqrt can't take a Column → exercises the pandas-UDF fallback tier."""
    f = dfp.FunctionTransformer(inputs=["col3"], outputs=["col4"], func=np.sqrt)
    out = f.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": [1.0, 2.0, 3.0, 4.0]}))


def test_dfn_sqrt_native(spark):
    """Same lambda via the Column-aware shim → stays on the native tier."""
    f = dfp.FunctionTransformer(inputs=["col3"], outputs=["col4"], func=dfn.sqrt)
    out = f.fit_transform(_df(spark))
    assert "pythonUDF" not in out._jdf.queryExecution().executedPlan().toString().lower().replace(" ", "")
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": [1.0, 2.0, 3.0, 4.0]}))


def test_if_else_fallback(spark):
    """Python truthiness on a Column raises → UDF tier reproduces row semantics."""
    f = dfp.FunctionTransformer(
        inputs=["col1"], outputs=["col4"], func=lambda x: 1 if x > 2 else 0
    )
    out = f.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "col4": [0, 0, 1, 1]}))


def test_div_seconds_per_day(spark):
    """The FraudDetection1 lambda x/86400.0 (reference FraudDetection1.py:128)."""
    f = dfp.FunctionTransformer(inputs=["col2"], outputs=["col4"], func=lambda x: x / 86400.0)
    out = f.fit_transform(_df(spark))
    assert_frames_equal(
        out, pd.DataFrame({**BASE, "col4": [10 / 86400.0, 20 / 86400.0, 30 / 86400.0, 40 / 86400.0]})
    )
