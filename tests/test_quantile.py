"""QuantileBinner — equal-frequency binning with exact interpolated
boundaries (numpy.percentile linear parity, like Imputer median)."""

import numpy as np
import pandas as pd
import pytest

from dataframe_pipeline_spark.operators import QuantileBinner


def _bin(values, bounds):
    return [None if v is None else sum(v > b for b in bounds)
            for v in values]


def test_quartile_boundaries_match_numpy(spark):
    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    qb = QuantileBinner(inputs=["x"], outputs=["xb"], n_bins=4).fit(sdf)
    exp = np.percentile(vals, [25, 50, 75], method="linear")
    assert qb.boundaries_[0] == pytest.approx(list(exp), abs=1e-12)


def test_transform_assigns_expected_bins(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    qb = QuantileBinner(inputs=["x"], outputs=["xb"], n_bins=4)
    out = qb.fit_transform(sdf).orderBy("x").toPandas()
    expected = _bin(vals, qb.boundaries_[0])
    assert list(out["xb"]) == expected
    # equal-frequency on uniform data: 2 values per quartile
    assert sorted(out["xb"].value_counts().tolist()) == [2, 2, 2, 2]


def test_value_on_boundary_falls_in_lower_bin(spark):
    # boundary values are interpolated; with 0..4 the median is 2.0 and
    # the row equal to it must go to the lower bin (strict >)
    vals = [0.0, 1.0, 2.0, 3.0, 4.0]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    qb = QuantileBinner(inputs=["x"], outputs=["xb"], n_bins=2).fit(sdf)
    assert qb.boundaries_[0] == [2.0]
    out = dict(qb.transform(sdf).select("x", "xb").collect())
    assert out[2.0] == 0 and out[3.0] == 1


def test_null_and_nan_propagate(spark):
    pdf = pd.DataFrame({"x": [1.0, None, float("nan"), 4.0, 2.0, 3.0]})
    sdf = spark.createDataFrame(pdf)
    qb = QuantileBinner(inputs=["x"], outputs=["xb"], n_bins=2)
    out = qb.fit_transform(sdf).toPandas()
    assert out["xb"].isna().sum() == 2
    # NaN ignored during fit: boundaries computed over [1,2,3,4]
    assert qb.boundaries_[0] == [2.5]


def test_multi_column_single_scan(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0],
                        "b": [10.0, 20.0, 30.0, 40.0]})
    sdf = spark.createDataFrame(pdf)
    qb = QuantileBinner(inputs=["a", "b"], outputs=["ab", "bb"], n_bins=2)
    out = qb.fit_transform(sdf).orderBy("a").toPandas()
    assert list(out["ab"]) == [0, 0, 1, 1]
    assert list(out["bb"]) == [0, 0, 1, 1]


def test_duplicate_boundaries_collapse(spark):
    # heavy mass at one value -> repeated boundary; bins skip, no error
    vals = [5.0] * 10 + [9.0]
    sdf = spark.createDataFrame(pd.DataFrame({"x": vals}))
    qb = QuantileBinner(inputs=["x"], outputs=["xb"], n_bins=4)
    out = qb.fit_transform(sdf).toPandas()
    assert set(out["xb"]) <= {0, 1, 2, 3}
    assert (out["xb"] == 0).sum() == 10  # all 5.0s below every boundary>5


def test_n_bins_validation():
    with pytest.raises(ValueError):
        QuantileBinner(inputs=["x"], outputs=["y"], n_bins=1)
