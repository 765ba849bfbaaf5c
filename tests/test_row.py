"""Ported from /root/reference/dfpipeline/tests/test_row.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "Gender": ["male", "p", "female", "p"],
        "Job": ["sales", "engineer", "N/A", "service"],
        "Age": [30, 22, 25, 44],
    }))


def test_gender(spark):
    row = dfp.RowTransformer(columns=["Gender"], drop_values=["p"])
    out = row.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "Gender": ["male", "female"], "Job": ["sales", "N/A"], "Age": [30, 25],
    }))


def test_gender_job(spark):
    row = dfp.RowTransformer(columns=["Gender", "Job"], drop_values=["p", "N/A"])
    out = row.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "Gender": ["male"], "Job": ["sales"], "Age": [30],
    }))


def test_null_rows_kept(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a", None, "p"]}))
    row = dfp.RowTransformer(columns=["g"], drop_values=["p"])
    assert_frames_equal(row.fit_transform(df), pd.DataFrame({"g": ["a", None]}))
