"""Feature assembly + model-boundary scoring (the reference's
dense_input tensor sink, distributed)."""

import numpy as np
import pandas as pd

from dataframe_pipeline_spark.features import assemble_features, score_with


def test_assemble_features(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]}))
    out = assemble_features(df, ["a", "b"]).collect()
    assert [list(r.dense_input) for r in out] == [[1.0, 3.0], [2.0, 4.0]]
    assert dict(assemble_features(df, ["a", "b"]).dtypes)["dense_input"] == "array<float>"


def test_score_with_linear_model(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2], "a": [1.0, 2.0, 3.0], "b": [10.0, 20.0, 30.0]}))

    def model(X: np.ndarray) -> np.ndarray:     # w = (2, 0.1)
        return X @ np.array([2.0, 0.1], dtype="float32")

    out = {r.i: r.prediction for r in score_with(df, ["a", "b"], model).collect()}
    assert out == {0: 3.0, 1: 6.0, 2: 9.0}
