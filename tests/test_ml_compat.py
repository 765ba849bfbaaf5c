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


def test_new_operators_as_ml_stages(spark):
    """Round-4 operators compose inside a stock pyspark.ml.Pipeline."""
    from pyspark.ml import Pipeline

    from dataframe_pipeline_spark import OutlierClipper, TargetEncoder
    from dataframe_pipeline_spark.ml_compat import as_ml_stage

    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(40)] + [(99, "a", 1e6)],
        "id long, cat string, y double")
    pipe = Pipeline(stages=[
        as_ml_stage(TargetEncoder(inputs=["cat"], outputs=["cat_code"],
                                  target="y", smoothing=5.0)),
        as_ml_stage(OutlierClipper(inputs=["y"], outputs=["y_clip"],
                                   strategy="iqr", exact=True)),
    ])
    out = pipe.fit(df).transform(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[99].y_clip < 1e6             # outlier clamped
    assert rows[0].cat_code is not None      # encoded
    assert set(out.columns) >= {"cat_code", "y_clip"}
