"""asof_join: backward as-of semantics (pandas merge_asof / DuckDB ASOF)."""

import datetime as dt

import pandas as pd

from dataframe_pipeline_spark.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 10.0),
         (1, _ts("2024-01-01 00:10:00"), 11.0),
         (2, _ts("2024-01-01 00:05:00"), 20.0)],
        "key long, ts timestamp, px double")
    trades = spark.createDataFrame(
        [(100, 1, _ts("2024-01-01 00:05:00")),   # between quotes -> 10.0
         (101, 1, _ts("2024-01-01 00:10:00")),   # exact tie -> inclusive 11.0
         (102, 1, _ts("2023-12-31 23:59:00")),   # before any quote -> null
         (103, 2, _ts("2024-01-01 01:00:00")),   # old quote -> 20.0
         (104, 3, _ts("2024-01-01 00:30:00"))],  # unseen key -> null
        "trade_id long, key long, ts timestamp")
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="key").toPandas().set_index("trade_id")
    assert out.loc[100, "px"] == 10.0
    assert out.loc[101, "px"] == 11.0      # ts tie is inclusive
    assert pd.isna(out.loc[102, "px"])     # nothing at-or-before
    assert out.loc[103, "px"] == 20.0
    assert pd.isna(out.loc[104, "px"])     # key never quoted
    assert len(out) == 5                   # every left row survives


def test_asof_tolerance(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="key",
                    tolerance_us=10 * 60 * 1_000_000).toPandas().set_index("trade_id")
    assert out.loc[100, "px"] == 10.0      # 5 min old: within tolerance
    assert pd.isna(out.loc[103, "px"])     # 55 min old: too stale
