"""timeseries.resample: dense per-key grid with gap fill."""

import datetime as dt

import pytest

from dataframe_pipeline_spark.timeseries import resample


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_resample_fills_gaps(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:10:00"), 2.0),
         (1, _ts("2024-01-01 00:40:00"), 3.0),
         # key 1 silent for hours 01 and 02
         (1, _ts("2024-01-01 03:05:00"), 5.0),
         (2, _ts("2024-01-01 01:00:00"), 7.0)],
        "k long, ts timestamp, v double")
    out = resample(ev, key="k", ts_col="ts", step_seconds=3600,
                   aggs={"n": ("count", "v"), "total": ("sum", "v")})
    rows = {(r.k, r.bucket.hour): (r.n, r.total) for r in out.collect()}
    assert rows[(1, 0)] == (2, 5.0)
    assert rows[(1, 1)] == (0, 0.0)      # gap -> zero-filled
    assert rows[(1, 2)] == (0, 0.0)
    assert rows[(1, 3)] == (1, 5.0)
    assert rows[(2, 1)] == (1, 7.0)      # single-bucket key: no padding
    assert len(rows) == 5                # 4 hours key 1 + 1 hour key 2


def test_resample_fill_none_keeps_nulls(spark):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 1.0),
         (1, _ts("2024-01-01 02:00:00"), 1.0)],
        "k long, ts timestamp, v double")
    out = resample(ev, "k", "ts", 3600,
                   aggs={"total": ("sum", "v")}, fill=None)
    by_hour = {r.bucket.hour: r.total for r in out.collect()}
    assert by_hour[0] == 1.0 and by_hour[2] == 1.0
    assert by_hour[1] is None            # NULL, not zero


def test_resample_null_values_counted_like_sql(spark):
    # count(col) skips NULLs; sum skips NULLs — SQL semantics
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), None),
         (1, _ts("2024-01-01 00:30:00"), 4.0)],
        "k long, ts timestamp, v double")
    out = resample(ev, "k", "ts", 3600,
                   aggs={"n": ("count", "v"), "total": ("sum", "v")})
    r = out.collect()[0]
    assert (r.n, r.total) == (1, 4.0)


def test_resample_validation(spark):
    ev = spark.createDataFrame([(1, _ts("2024-01-01"), 1.0)],
                               "k long, ts timestamp, v double")
    with pytest.raises(ValueError, match="step_seconds"):
        resample(ev, "k", "ts", 0, aggs={"n": ("count", "v")})
    with pytest.raises(ValueError, match="at least one"):
        resample(ev, "k", "ts", 60, aggs={})
    with pytest.raises(ValueError, match="sum/count"):
        resample(ev, "k", "ts", 60, aggs={"m": ("median", "v")})


def test_resample_gapfill_is_single_pass(spark):
    """The dense grid comes from one lag/sequence window over the sparse
    aggregate — ONE scan of the raw data, no spine join of any kind
    (the old shape evaluated the fact aggregate twice and joined)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = resample(ev, "user_id", "ts", 86400,
                   aggs={"n": ("count", "event_id")})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert "Window" in plan
