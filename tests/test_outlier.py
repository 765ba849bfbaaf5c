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


def test_scaler_robust_approx_tier(spark):
    """Scaler(strategy='robust', approx=True): sketch-fitted quartiles
    land within the GK rank-error band of the exact fit, and transform
    arithmetic is identical (subtract-then-multiply)."""
    import numpy as np

    from dataframe_pipeline_spark.operators import Scaler

    rng = np.random.RandomState(7)
    vals = rng.lognormal(10, 1, 5000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")

    exact = Scaler(inputs=["x"], outputs=["y"], strategy="robust").fit(df)
    approx = Scaler(inputs=["x"], outputs=["y"], strategy="robust",
                    approx=True).fit(df)
    # rank slack 2/accuracy of 5000 rows = at most 1 rank either side
    s = sorted(vals)
    for q, got in [(0.5, approx.offsets[0])]:
        r = q * (len(s) - 1)
        lo, hi = s[max(0, int(r) - 2)], s[min(len(s) - 1, int(r) + 3)]
        assert lo <= got <= hi
    # scales agree to the same band (IQR from neighboring ranks)
    assert abs(1 / approx.scales[0] - 1 / exact.scales[0]) \
        <= (s[3751] - s[3748]) + (s[1251] - s[1248])


def test_sketch_tier_queries_match_generated_oracles(spark):
    """clip_outliers_approx / scaler_robust_approx / expect_orders_hll:
    the generated oracle replays the SAME fitted literals the Spark
    query uses (shared fit cache), so results match value-for-value."""
    import duckdb

    from dataframe_pipeline_spark import ext_queries as xq

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name in ["clip_outliers_approx", "scaler_robust_approx",
                 "expect_orders_hll"]:
        fn, sql = xq.EXT_QUERIES[name]
        got = fn(spark, sf).toPandas()
        exp = con.sql(sql(sf) if callable(sql) else sql).df()
        assert len(got) == len(exp), name
        key = list(got.columns)
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        for c in got.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            assert gv == ev or all(
                (x == y) or (x != x and y != y) for x, y in zip(gv, ev)
            ), f"{name}.{c}"
    con.close()
