"""Our operators inside a stock pyspark.ml.Pipeline must equal the
native DataframePipeline result."""

import pandas as pd

import dataframe_pipeline_spark as dfp
from dataframe_pipeline_spark.ml_compat import as_ml_pipeline


def _steps():
    return [
        dfp.ComplementLabelEncoder(inputs=["c"], outputs=["c_id"]),
        dfp.FrequencyEncoder(inputs=["c"], outputs=["c_freq"]),
        dfp.Scaler(inputs=["x"], outputs=["x_mm"], strategy="minmax"),
        dfp.FunctionTransformer(inputs=["x"], outputs=["x2"],
                                func=lambda v: v * 2),
    ]


def test_ml_pipeline_equals_native(spark):
    pdf = pd.DataFrame({"c": ["a", "b", "a", "c"], "x": [1.0, 2.0, 3.0, 4.0]})
    df = spark.createDataFrame(pdf)

    ml_model = as_ml_pipeline(_steps()).fit(df)        # pyspark.ml.PipelineModel
    got = ml_model.transform(df).orderBy("x").collect()

    native = dfp.DataframePipeline(steps=_steps())
    exp = native.fit_transform(df).orderBy("x").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]


def test_ml_model_applies_fitted_state(spark):
    train = spark.createDataFrame(pd.DataFrame({"c": ["a", "b"], "x": [0.0, 10.0]}))
    test = spark.createDataFrame(pd.DataFrame({"c": ["zz"], "x": [5.0]}))
    model = as_ml_pipeline(_steps()).fit(train)
    row = model.transform(test).head()
    assert row.c_id == 2        # unseen -> extra_category_ (a=0, b=1, extra=2)
    assert row.x_mm == 0.5      # scaled by TRAIN min/max
