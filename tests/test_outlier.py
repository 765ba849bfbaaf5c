"""OutlierClipper: quantile/IQR bounds, clip vs filter modes, NULL/NaN
passthrough, exact-vs-approx tiers; write_clustered layout round-trip."""

import math

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.operators.outlier_clipper import OutlierClipper


@pytest.fixture()
def frame(spark):
    vals = [float(v) for v in range(1, 101)] + [1e6, -1e6]  # 2 wild outliers
    rows = [(i, v) for i, v in enumerate(vals)]
    rows += [(200, None), (201, float("nan"))]
    return spark.createDataFrame(rows, "id long, x double")


def test_quantile_clip_exact(spark, frame):
    op = OutlierClipper(inputs=["x"], outputs=["y"], strategy="quantile",
                        lo_q=0.1, hi_q=0.9, exact=True)
    out = op.fit_transform(frame)
    lo, hi = op.bounds_[0]
    assert lo < hi and lo > -1e6 and hi < 1e6
    got = {r.id: r.y for r in out.collect()}
    assert got[100] == hi and got[101] == lo         # outliers clamped
    mid = got[50]                                    # x=51, interior value
    assert lo <= mid <= hi and mid == 51.0
    assert got[200] is None                          # NULL passes through
    assert got[201] is None or math.isnan(got[201])  # NaN not an outlier


def test_iqr_filter_mode(spark, frame):
    op = OutlierClipper(inputs=["x"], strategy="iqr", mode="filter",
                        k=1.5, exact=True)
    out = op.fit_transform(frame)
    ids = {r.id for r in out.collect()}
    assert 100 not in ids and 101 not in ids         # wild rows dropped
    assert set(range(100)) <= ids                    # all interior kept
    assert 200 in ids and 201 in ids                 # missing is not outlier
    assert out.columns == frame.columns              # filter keeps schema


def test_approx_tier_close_to_exact(spark):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id").cast("double")).alias("x"))
    exact = OutlierClipper(inputs=["x"], strategy="quantile",
                           lo_q=0.01, hi_q=0.99, exact=True).fit(df)
    approx = OutlierClipper(inputs=["x"], strategy="quantile",
                            lo_q=0.01, hi_q=0.99).fit(df)
    (elo, ehi), (alo, ahi) = exact.bounds_[0], approx.bounds_[0]
    assert abs(elo - alo) <= 100 and abs(ehi - ahi) <= 100  # within 1%


def test_all_null_column_is_noop(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, x double")
    op = OutlierClipper(inputs=["x"], strategy="iqr", exact=True)
    out = op.fit_transform(df)
    assert [r.x for r in out.collect()] == [None, None]


def test_constructor_validation(spark):
    with pytest.raises(ValueError, match="strategy"):
        OutlierClipper(inputs=["x"], strategy="zscore")
    with pytest.raises(ValueError, match="clip|filter"):
        OutlierClipper(inputs=["x"], mode="drop")
    with pytest.raises(ValueError, match="lo_q"):
        OutlierClipper(inputs=["x"], strategy="quantile", lo_q=0.9, hi_q=0.1)
    with pytest.raises(RuntimeError, match="before fit"):
        OutlierClipper(inputs=["x"]).transform(None)


def test_transform_is_pure_codegen(spark, frame):
    """Clip transform must stay JVM-side — no Python evaluation node."""
    op = OutlierClipper(inputs=["x"], outputs=["y"], exact=True).fit(frame)
    plan = op.transform(frame)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_write_clustered_roundtrip_and_layout(spark, tmp_path):
    from dataframe_pipeline_spark.sources import write_clustered

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(300)],
        "id long, part string, v double")
    path = str(tmp_path / "clustered")
    write_clustered(df, path, partition_by=["part"], cluster_by=["id"])

    back = spark.read.parquet(path)
    assert back.count() == 300
    got = sorted((r.id, r.part, r.v) for r in back.collect())
    assert got == sorted((i, ["a", "b", "c"][i % 3], float(i))
                         for i in range(300))

    # one file per partition dir (the repartition concentrated writers)
    import glob
    for p in ("a", "b", "c"):
        files = glob.glob(f"{path}/part={p}/*.parquet")
        assert len(files) == 1, files

    # partition filter reaches the scan as PartitionFilters,
    # cluster filter as PushedFilters
    q = back.filter((F.col("part") == "b") & (F.col("id") < 10))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan
    assert "PushedFilters" in plan and "LessThan(id,10)" in plan
