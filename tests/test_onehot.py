"""Ported from /root/reference/dfpipeline/tests/test_onehot.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal

SEX = ["male", "female", "female", "male", "female", "male", "female", "female"]
C2 = [3.0, 4.0, 6.0, 9.0, None, 17.0, 20.0, 100.0]


def test_onehot(spark):
    df = spark.createDataFrame(pd.DataFrame({"sex": SEX, "C2": C2}))
    one = dfp.OneHotEncoder(columns=["sex"])
    out = one.fit_transform(df)
    assert_frames_equal(out, pd.DataFrame({
        "sex": SEX,
        "C2": C2,
        "sex__female": [0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 1.0, 1.0],
        "sex__male": [1.0, 0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0],
    }))
