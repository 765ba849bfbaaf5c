"""base.exact_percentiles: the scale-safe exact-percentile helper must
be value-identical to Spark's percentile() (which itself matches DuckDB
quantile_cont) across shapes, including the interpolation arithmetic."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.base import exact_percentiles


def _want(df, col, qs):
    row = df.agg(F.percentile(
        col, F.array(*[F.lit(q) for q in qs]))).collect()[0][0]
    return None if row is None else [None if v is None else float(v)
                                     for v in row]


def test_matches_percentile_on_mixed_data(spark):
    import random

    rnd = random.Random(7)
    rows = [(rnd.gauss(100.0, 25.0),) for _ in range(5000)]
    rows += [(None,)] * 137 + [(100.0,)] * 500     # nulls + heavy ties
    df = spark.createDataFrame(rows, "x double").repartition(8)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.93, 1.0]
    got = exact_percentiles(df, [F.col("x")], [[*qs]])[0]
    assert got == _want(df, F.col("x"), qs)


def test_two_columns_different_quantiles(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 1001)],
        "a double, b double")
    got = exact_percentiles(df, [F.col("a"), F.col("b")],
                            [[0.5], [0.1, 0.9]])
    assert got[0] == _want(df, F.col("a"), [0.5])
    assert got[1] == _want(df, F.col("b"), [0.1, 0.9])


def test_edges(spark):
    one = spark.createDataFrame([(42.0,)], "x double")
    assert exact_percentiles(one, [F.col("x")], [[0.0, 0.5, 1.0]]) \
        == [[42.0, 42.0, 42.0]]
    const = spark.createDataFrame([(1.5,)] * 999, "x double")
    assert exact_percentiles(const, [F.col("x")], [[0.25, 0.75]]) \
        == [[1.5, 1.5]]
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_percentiles(nulls, [F.col("x")], [[0.5]]) == [[None]]


def test_accuracy_rescales_with_n(spark):
    """The scale contract (ADVICE r7): when n > 8192*accuracy, pass 1
    re-runs with accuracy ceil(n/8192) so the pass-2 interior gather
    stays ~64k rows at any corpus size.  accuracy=2 over 50k rows
    forces the rescale path (50k > 16384); values must still be
    bit-identical to percentile()."""
    df = spark.range(0, 50_000).selectExpr(
        "cast(id * 7919 % 49999 as double) as x").repartition(8)
    qs = [0.01, 0.5, 0.99]
    got = exact_percentiles(df, [F.col("x")], [[*qs]], accuracy=2)[0]
    assert got == _want(df, F.col("x"), qs)


def test_interpolation_matches_spark_lerp(spark):
    # 7 values, q=0.3 -> pos 1.8: 2.0*(2-1.8) + 3.0*(1.8-1) must use
    # Spark's v_l*(h-pos) + v_h*(pos-l) double arithmetic exactly
    df = spark.createDataFrame([(float(i),) for i in range(7)], "x double")
    got = exact_percentiles(df, [F.col("x")], [[0.3]])[0]
    assert got == _want(df, F.col("x"), [0.3])
