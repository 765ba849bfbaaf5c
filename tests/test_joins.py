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


def test_asof_forward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="key",
                    direction="forward").toPandas().set_index("trade_id")
    assert out.loc[100, "px"] == 11.0      # next quote at 00:10
    assert out.loc[101, "px"] == 11.0      # ts tie is inclusive forward too
    assert out.loc[102, "px"] == 10.0      # earliest quote ahead
    assert pd.isna(out.loc[103, "px"])     # no quote after 01:00
    assert pd.isna(out.loc[104, "px"])
    assert len(out) == 5


def test_asof_forward_tolerance(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="key", direction="forward",
                    tolerance_us=2 * 60 * 1_000_000).toPandas().set_index("trade_id")
    assert pd.isna(out.loc[100, "px"])     # 5 min ahead: too far
    assert out.loc[102, "px"] == 10.0      # 1 min ahead: within


def test_asof_nearest(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="key",
                    direction="nearest").toPandas().set_index("trade_id")
    assert out.loc[100, "px"] == 10.0      # 5 min back vs 5 min fwd: tie -> backward
    assert out.loc[101, "px"] == 11.0      # exact match
    assert out.loc[102, "px"] == 10.0      # only forward exists
    assert out.loc[103, "px"] == 20.0      # only backward exists
    assert pd.isna(out.loc[104, "px"])


def test_asof_nearest_matches_pandas(spark):
    trades, quotes = _frames(spark)
    got = (asof_join(trades, quotes, on="key", direction="nearest")
           .toPandas().sort_values("trade_id").reset_index(drop=True))
    exp = pd.merge_asof(
        trades.toPandas().sort_values("ts"),
        quotes.toPandas().sort_values("ts"),
        on="ts", by="key", direction="nearest",
    ).sort_values("trade_id").reset_index(drop=True)
    assert got["px"].fillna(-1).tolist() == exp["px"].fillna(-1).tolist()


def test_asof_single_shuffle_all_directions(spark):
    trades, quotes = _frames(spark)
    for d in ("backward", "forward", "nearest"):
        out = asof_join(trades, quotes, on="key", direction=d)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2, d  # union inputs, one shuffle
        assert "Join" not in plan, d           # never a range self-join


def _null_payload_frames(spark):
    """Right rows where a carried column is NULL: the matched row's NULL
    must surface as NULL, never be back-filled from an older/newer row
    (merge_asof parity — ADVICE r4)."""
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 10.0, "a"),
         (1, _ts("2024-01-01 00:10:00"), None, "b"),   # px NULL at 00:10
         (1, _ts("2024-01-01 00:20:00"), 12.0, None)],  # src NULL at 00:20
        "key long, ts timestamp, px double, src string")
    trades = spark.createDataFrame(
        [(200, 1, _ts("2024-01-01 00:11:00")),   # matches 00:10 row
         (201, 1, _ts("2024-01-01 00:21:00")),   # matches 00:20 row
         (202, 1, _ts("2024-01-01 00:05:00"))],  # matches 00:00 row
        "trade_id long, key long, ts timestamp")
    return trades, quotes


def test_asof_null_payload_backward(spark):
    trades, quotes = _null_payload_frames(spark)
    out = (asof_join(trades, quotes, on="key")
           .toPandas().set_index("trade_id"))
    assert pd.isna(out.loc[200, "px"])          # matched row's px IS null
    assert out.loc[200, "src"] == "b"           # same row's src carried
    assert out.loc[201, "px"] == 12.0
    assert pd.isna(out.loc[201, "src"])         # not back-filled from "b"
    assert out.loc[202, "px"] == 10.0 and out.loc[202, "src"] == "a"


def test_asof_null_payload_matches_pandas_all_directions(spark):
    trades, quotes = _null_payload_frames(spark)
    for d in ("backward", "forward", "nearest"):
        got = (asof_join(trades, quotes, on="key", direction=d)
               .toPandas().sort_values("trade_id").reset_index(drop=True))
        exp = pd.merge_asof(
            trades.toPandas().sort_values("ts"),
            quotes.toPandas().sort_values("ts"),
            on="ts", by="key", direction=d,
        ).sort_values("trade_id").reset_index(drop=True)
        assert got["px"].fillna(-1).tolist() == exp["px"].fillna(-1).tolist(), d
        assert got["src"].fillna("-").tolist() == exp["src"].fillna("-").tolist(), d


def test_asof_nearest_null_payload_same_row(spark):
    # nearest must take payload AND distance from one side's matched row
    trades, quotes = _null_payload_frames(spark)
    out = (asof_join(trades, quotes, on="key", direction="nearest")
           .toPandas().set_index("trade_id"))
    # 00:11 -> backward 00:10 (1 min) beats forward 00:20 (9 min):
    # px NULL + src "b" from that single row
    assert pd.isna(out.loc[200, "px"]) and out.loc[200, "src"] == "b"


def test_asof_bad_direction(spark):
    trades, quotes = _frames(spark)
    import pytest
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="key", direction="sideways")
