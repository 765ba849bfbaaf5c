"""Ported from /root/reference/dfpipeline/tests/test_typeconv.py."""
import numpy as np
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def test_typeconv(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "sex": ["male", "female"], "C2": [3, 9],
    }))
    conv = dfp.TypeConverter(columns=["C2"], type=np.float64)
    out = conv.fit_transform(df)
    assert dict(out.dtypes)["C2"] == "double"
    assert_frames_equal(out, pd.DataFrame({"sex": ["male", "female"], "C2": [3.0, 9.0]}))


def test_typeconv_float32(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1.5, 2.5]}))
    out = dfp.TypeConverter(columns=["x"], type=np.float32).fit_transform(df)
    assert dict(out.dtypes)["x"] == "float"
