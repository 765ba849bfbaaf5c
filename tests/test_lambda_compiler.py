"""AST→Column lambda compiler: the Spark analog of the reference's
bytecode→ONNX compiler (walkBytecode.py op tables, fusion, if/else)."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dataframe_pipeline_spark.lambda_compiler import compile_lambda
from dataframe_pipeline_spark.operators import FunctionTransformer

THRESH = 3.0  # closure/global constant baked in at compile time


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "x": [1.5, 4.0, 9.0, 0.25],
            "y": [2.0, 2.0, 3.0, 0.5],
            "s": ["a b", "c d", "ab-cd", "z"],
        }))


def _vals(df, col):
    return [r[0] for r in df.select(col).collect()]


def _compiled(df, func, cols):
    expr = compile_lambda(func, [F.col(c) for c in cols])
    assert expr is not None, "expected native compilation"
    return df.withColumn("out", expr)


def test_arithmetic_and_math(df):
    out = _compiled(df, lambda x: x - math.floor(x), ["x"])
    assert _vals(out, "out") == [0.5, 0.0, 0.0, 0.25]


def test_numpy_calls(df):
    out = _compiled(df, lambda x: np.sqrt(x) + np.floor(x), ["x"])
    exp = [math.sqrt(v) + math.floor(v) for v in [1.5, 4.0, 9.0, 0.25]]
    assert _vals(out, "out") == pytest.approx(exp)


def test_ifexp_and_comparison(df):
    out = _compiled(df, lambda x, y: x * 2 if x > y else y, ["x", "y"])
    assert _vals(out, "out") == [2.0, 8.0, 18.0, 0.5]


def test_in_list(df):
    out = _compiled(df, lambda s: 1 if s in ["a b", "z"] else 0, ["s"])
    assert _vals(out, "out") == [1, 0, 0, 1]


def test_closure_constant(df):
    t = THRESH
    out = _compiled(df, lambda x: x - t, ["x"])
    assert _vals(out, "out") == [-1.5, 1.0, 6.0, -2.75]


def test_str_lower_and_cast(df):
    out = _compiled(df, lambda x: str(x), ["y"])
    assert _vals(out, "out") == ["2.0", "2.0", "3.0", "0.5"]


def test_split_subscript(df):
    out = _compiled(df, lambda s: s.split("-")[0], ["s"])
    assert _vals(out, "out") == ["a b", "c d", "ab", "z"]


def test_log1p_fusion(df):
    expr = compile_lambda(lambda x: np.log(1 + x), [F.col("x")])
    assert "LOG1P" in str(expr).upper()
    out = df.withColumn("out", expr)
    assert _vals(out, "out") == pytest.approx([math.log1p(v) for v in [1.5, 4.0, 9.0, 0.25]])


def test_expm1_fusion(df):
    expr = compile_lambda(lambda x: np.exp(x) - 1, [F.col("x")])
    assert "EXPM1" in str(expr).upper()


def test_unsupported_returns_none():
    assert compile_lambda(lambda x: [v for v in range(int(x))], [F.col("x")]) is None
    assert compile_lambda(lambda x: hash(x), [F.col("x")]) is None


def test_function_transformer_goes_native(df):
    """No pythonUDF in the physical plan for a plain math lambda."""
    ft = FunctionTransformer(inputs=["x"], outputs=["cents"],
                             func=lambda x: x - math.floor(x))
    out = ft.fit_transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan
    assert _vals(out, "cents") == [0.5, 0.0, 0.0, 0.25]


def test_function_transformer_udf_fallback(df):
    """A genuinely non-compilable lambda still works via pandas UDF."""
    ft = FunctionTransformer(inputs=["s"], outputs=["h"],
                             func=lambda s: s[::-1], returns=str)
    out = ft.fit_transform(df)
    assert _vals(out, "h") == ["b a", "d c", "dc-ba", "z"]


def test_nary_mean_compiles_native(df):
    """walkBytecode 'mean' → ONNX Mean analog: np.mean over a tuple of
    columns compiles to (a+b)/2 with no Python in the plan."""
    out = _compiled(df, lambda x, y: np.mean((x, y)), ["x", "y"])
    assert _vals(out, "out") == [1.75, 3.0, 6.0, 0.375]
    assert "EvalPython" not in out._jdf.queryExecution().executedPlan().toString()


def test_min_over_list(df):
    out = _compiled(df, lambda x, y: min([x, y]), ["x", "y"])
    assert _vals(out, "out") == [1.5, 2.0, 3.0, 0.25]


def test_timedelta_seconds_origin(spark):
    """walkBytecode 'timedelta' analog: the reference's
    `START_DATE + datetime.timedelta(seconds=x)` idiom
    (benchmarks/fraud_detection_1/FraudDetection1.py:172) compiles to a
    native timestamp_seconds expression."""
    import datetime

    START_DATE = datetime.datetime(2017, 11, 30)
    f = lambda x: START_DATE + datetime.timedelta(seconds=x)
    sdf = spark.createDataFrame([(0,), (86400,), (90061,)], "x long")
    out = _compiled(sdf, f, ["x"])
    got = _vals(out, "out")
    exp = [f(v) for v in [0, 86400, 90061]]
    assert got == exp
    assert "EvalPython" not in out._jdf.queryExecution().executedPlan().toString()


def test_timedelta_mixed_units_and_sub(spark):
    import datetime

    ANCHOR = datetime.datetime(2020, 1, 1, 12, 0, 0)
    f = lambda d: ANCHOR - datetime.timedelta(days=d, hours=1)
    sdf = spark.createDataFrame([(0,), (2,)], "d long")
    out = _compiled(sdf, f, ["d"])
    assert _vals(out, "out") == [f(0), f(2)]


def test_timedelta_on_timestamp_column(spark):
    import datetime

    f = lambda t, s: t + datetime.timedelta(seconds=s)
    sdf = spark.createDataFrame(
        [(datetime.datetime(2021, 5, 1, 0, 0, 0), 3600)], "t timestamp, s long")
    out = _compiled(sdf, f, ["t", "s"])
    assert _vals(out, "out") == [datetime.datetime(2021, 5, 1, 1, 0, 0)]
