"""Time-series resampling with gap fill — regularize an event stream
onto a fixed grid per key (the feature-engineering step before any
windowed model: "hourly activity per user, zeros where idle").

Spark-first shape:

1. bucket every row to its grid cell (``floor(epoch/step)*step`` —
   pure codegen) and aggregate per (key, bucket): ONE keyed shuffle
   over the data, partial-aggregated map-side.
2. gap-fill with one window over that (tiny) sparse aggregate:
   ``lag(bucket)`` per key, then ``explode(sequence(prev+step ..
   bucket))`` emits each gap's fill rows together with the real row.
   Every bucket in [first, last] lies in exactly one (prev, cur]
   interval, so this is the dense spine by construction — with ONE
   exchange after the data aggregate, no spine LEFT JOIN, and no
   second evaluation of the aggregate subtree (the join shape
   computed it once per consumer; A/B at sf1: 2.21 → 1.66 s).

The fill rows are still *generated*, never carried per source row:
the sequence explode is bounded by ``(last-first)/step`` per key and
never touches the raw data again.

Skew note: a hot key costs one window partition over its |buckets|
sparse rows — the same grain the old spine join shuffled; the heavy
per-event work stays in step 1's partial-aggregated shuffle.

The fill value applies to ALL aggregate columns (default 0 for counts
and sums; pass ``fill=None`` to keep NULLs for "no data" semantics —
means usually want NULL, counts want 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(df: DataFrame, key: str | list[str], ts_col: str,
             step_seconds: int, aggs: dict,
             fill: float | None = 0) -> DataFrame:
    """Dense per-key time grid: one row per (key, bucket) for every
    ``step_seconds`` bucket between the key's first and last event,
    with ``aggs`` (output name -> (func, source col), func in
    {"sum", "count"}) computed where data exists and ``fill``
    elsewhere.  Sums are exact DECIMAL(28,6) surfaced as double."""
    keys = [key] if isinstance(key, str) else list(key)
    if step_seconds <= 0:
        raise ValueError("step_seconds must be > 0")
    if not aggs:
        raise ValueError("resample needs at least one aggregate")
    step = F.lit(int(step_seconds))
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step)

    agg_exprs = []
    for out, (func, src) in aggs.items():
        if func == "sum":
            agg_exprs.append(
                F.sum(F.col(src).cast("decimal(28,6)"))
                .cast("double").alias(out))
        elif func == "count":
            agg_exprs.append(F.count(F.col(src)).alias(out))
        else:
            raise ValueError(f"resample agg must be sum/count, not {func!r}")
    sparse = (df.withColumn("__bucket", bucket)
              .groupBy(*keys, "__bucket").agg(*agg_exprs))

    # dense grid via per-key gap fill: each sparse row emits the fill
    # buckets of its (prev, cur] interval plus itself — bounded by
    # range/step per key, one window exchange, no spine join
    w = Window.partitionBy(*keys).orderBy("__bucket")
    s = int(step_seconds)
    filled = (sparse
              .withColumn("__prev", F.lag("__bucket").over(w))
              .withColumn("__b", F.explode(F.expr(
                  f"sequence(coalesce(__prev + interval {s} second, "
                  f"__bucket), __bucket, interval {s} second)"))))
    cols = []
    for out_name, (func, _src) in aggs.items():
        v = F.when(F.col("__b") == F.col("__bucket"), F.col(out_name))
        if fill is not None:
            v = F.coalesce(v, F.lit(fill).cast(
                "bigint" if func == "count" else "double"))
        cols.append(v.alias(out_name))
    return filled.select(*keys, F.col("__b").alias("bucket"), *cols)
