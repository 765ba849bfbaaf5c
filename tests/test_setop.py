"""Ported from /root/reference/dfpipeline/tests/test_setop.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp


def _df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "sex": ["male", "female", "female", "male", "female", "male", "female", "female"],
        "C2": [3.0, 4.0, 6.0, 9.0, None, 17.0, 20.0, 100.0],
    }))


def test_cap(spark):
    captured = []
    so = dfp.SetTransformer(
        first_operand="sex", second_operand=["male"], output_operand="out",
        output_func=captured.extend, set_operation="*",
    )
    out = so.fit_transform(_df(spark))
    assert captured == ["male"]
    vals = [r["out"] for r in out.select("out").collect()]
    assert sorted(v for v in vals if v is not None) == ["male"]


def test_minus(spark):
    captured = []
    so = dfp.SetTransformer(
        first_operand="sex", second_operand=["male"], output_operand="out",
        output_func=captured.extend, set_operation="-",
    )
    so.fit_transform(_df(spark))
    assert captured == ["female"]


def test_union(spark):
    captured = []
    so = dfp.SetTransformer(
        first_operand="sex", second_operand=["other"], output_operand="out",
        output_func=captured.extend, set_operation="|",
    )
    so.fit_transform(_df(spark))
    assert captured == ["female", "male", "other"]
