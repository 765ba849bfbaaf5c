"""Pipeline driver tests — fit/transform/fit_transform threading semantics."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def test_fit_transform_chains_steps(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]}))
    pipe = dfp.DataframePipeline(steps=[
        dfp.FunctionTransformer(inputs=["a"], outputs=["a2"], func=lambda x: x * 2),
        dfp.FrequencyEncoder(inputs=["b"], outputs=["b_freq"]),
        dfp.ColumnSelector(columns=["a2", "b_freq"]),
    ])
    out = pipe.fit_transform(df)
    assert pipe.input_columns == ["a", "b"]
    assert pipe.output_columns == ["a2", "b_freq"]
    assert_frames_equal(out, pd.DataFrame({"a2": [2, 4, 6], "b_freq": [2, 1, 2]}))


def test_fit_then_transform_on_new_frame(spark):
    train = spark.createDataFrame(pd.DataFrame({"b": ["x", "x", "y"]}))
    test = spark.createDataFrame(pd.DataFrame({"b": ["y", "z"]}))
    pipe = dfp.DataframePipeline(steps=[
        dfp.FrequencyEncoder(inputs=["b"], outputs=["b_freq"]),
    ])
    pipe.fit(train)
    out = pipe.transform(test)
    assert_frames_equal(out, pd.DataFrame({"b": ["y", "z"], "b_freq": [1, 1]}))


def test_append_and_clear(spark):
    pipe = dfp.DataframePipeline()
    pipe.append(dfp.TypeConverter(columns=["a"], type=float))
    assert len(pipe.steps) == 1
    pipe.clear()
    assert pipe.steps == []
