"""reshape.py: pivot_agg / melt / discover_pivot_values — value
semantics, NULL handling, and the no-hidden-scan / no-shuffle plan
contracts."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.reshape import (
    discover_pivot_values, melt, pivot_agg)


@pytest.fixture()
def long_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0), (1, "a", 5.0),
         (2, "b", 7.0), (3, None, 99.0)],
        "uid long, kind string, v double")


def test_pivot_counts_and_sums(spark, long_df):
    out = pivot_agg(long_df, "uid", "kind", ["a", "b"],
                    lambda cond: F.sum(F.when(cond, F.col("v"))),
                    prefix="sum_")
    got = {r.uid: (r.sum_a, r.sum_b) for r in out.collect()}
    assert got[1] == (15.0, 20.0)
    assert got[2] == (None, 7.0)          # absent combo → NULL
    assert got[3] == (None, None)         # NULL pivot value matches nothing
    assert out.columns == ["uid", "sum_a", "sum_b"]


def test_pivot_requires_values(spark, long_df):
    with pytest.raises(ValueError, match="explicit list"):
        pivot_agg(long_df, "uid", "kind", [],
                  lambda cond: F.count(F.when(cond, 1)))


def test_pivot_single_aggregate_no_extra_scan(spark, long_df):
    """Explicit values → exactly one aggregate over one scan of the
    input; no distinct-discovery subquery in the plan."""
    out = pivot_agg(long_df, "uid", "kind", ["a", "b"],
                    lambda cond: F.count(F.when(cond, 1)))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") == 1


def test_discover_pivot_values(spark, long_df):
    assert discover_pivot_values(long_df, "kind") == ["a", "b"]
    with pytest.raises(ValueError, match="distinct values"):
        discover_pivot_values(spark.range(100).selectExpr(
            "cast(id as string) AS s"), "s", max_values=10)


def test_melt_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0)], "id long, x double, y double")
    long = melt(df, ["id"], ["x", "y"])
    assert long.columns == ["id", "variable", "value"]
    got = sorted((r.id, r.variable, r.value) for r in long.collect())
    assert got == [(1, "x", 10.0), (1, "y", 100.0),
                   (2, "x", 20.0), (2, "y", 200.0)]
    # melt then pivot back == original
    wide = pivot_agg(long, "id", "variable", ["x", "y"],
                     lambda cond: F.first(F.when(cond, F.col("value")),
                                          ignorenulls=True))
    back = sorted((r.id, r.x, r.y) for r in wide.collect())
    assert back == [(1, 10.0, 100.0), (2, 20.0, 200.0)]


def test_melt_is_shuffle_free(spark):
    df = spark.range(1000).select(
        F.col("id"), F.col("id").cast("double").alias("x"),
        (F.col("id") * 2).cast("double").alias("y"))
    long = melt(df, ["id"], ["x", "y"])
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_melt_validation(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="non-empty"):
        melt(df, ["id"], [])


def test_cube_agg_matches_native_cube(spark):
    from dataframe_pipeline_spark.reshape import cube_agg

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0), ("b", "x", 8.0)],
        "d1 string, d2 string, v double")
    got = cube_agg(df, ["d1", "d2"], sums={"sv": "v"}, count_col="n")
    exp = (df.cube("d1", "d2")
           .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")))
    key = lambda r: (r["d1"] or "", r["d2"] or "")
    g = {key(r): (r["sv"], r["n"]) for r in got.collect()}
    e = {key(r): (r["sv"], r["n"]) for r in exp.collect()}
    assert g == e
    assert len(g) == 3 + 2 + 2 + 1  # cells + two 1-dim sets + total


def test_cube_agg_grouping_sets_subset(spark):
    from dataframe_pipeline_spark.reshape import cube_agg

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("b", "y", 2.0)], "d1 string, d2 string, v double")
    out = cube_agg(df, ["d1", "d2"], sums={"sv": "v"},
                   grouping_sets=[("d1",), ()])
    rows = out.collect()
    assert all(r["d2"] is None for r in rows)
    assert {r["d1"]: r["sv"] for r in rows} == {"a": 1.0, "b": 2.0, None: 3.0}
    import pytest
    with pytest.raises(ValueError, match="not in dims"):
        cube_agg(df, ["d1"], sums={"sv": "v"}, grouping_sets=[("d2",)])


def test_cube_agg_no_expand_single_scan(spark):
    from dataframe_pipeline_spark.reshape import cube_agg

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = cube_agg(li, ["l_returnflag", "l_linestatus"],
                   sums={"q": "l_quantity"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    # every grouping set reads the checkpointed finest pre-aggregate
    # (localCheckpoint, so blocks are freed on GC — no session-lifetime
    # cache leak); the fact parquet is scanned exactly once, at
    # checkpoint materialization, and never appears in the output plan
    assert plan.count("Scan ExistingRDD") == 4
    assert "Scan parquet" not in plan
