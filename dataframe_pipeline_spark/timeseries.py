"""Time-series resampling with gap fill — regularize an event stream
onto a fixed grid per key (the feature-engineering step before any
windowed model: "hourly activity per user, zeros where idle").

Spark-first shape:

1. bucket every row to its grid cell (``floor(epoch/step)*step`` —
   pure codegen) and aggregate per (key, bucket): ONE keyed shuffle
   over the data, partial-aggregated map-side.
2. derive each key's [first, last] active bucket from that (tiny)
   aggregate — a second aggregation over |keys × buckets| rows, not
   over the data.
3. explode the per-key bucket ``sequence`` into the dense spine and
   LEFT-join the sparse aggregate back, filling misses.

Why not a window/lag approach: gap COUNTS are unbounded per row
(a key silent for a month needs 720 hourly zeros), so the dense grid
must be generated, not carried; the sequence explode is bounded by
``(last-first)/step`` per key and never touches the raw data again.

Skew note: the spine join keys on (key, bucket) — the same key-grain
as the data aggregate, so a hot key's spine rows spread over its
buckets rather than funnelling one partition.

The fill value applies to ALL aggregate columns (default 0 for counts
and sums; pass ``fill=None`` to keep NULLs for "no data" semantics —
means usually want NULL, counts want 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    # per-key active range from the aggregate (|keys| rows), then the
    # dense spine via sequence explode — bounded by range/step per key
    rng = sparse.groupBy(*keys).agg(F.min("__bucket").alias("__mn"),
                                    F.max("__bucket").alias("__mx"))
    spine = rng.select(
        *keys,
        F.explode(F.expr(
            f"sequence(__mn, __mx, interval {int(step_seconds)} second)"
        )).alias("__bucket"))

    out = spine.join(sparse, [*keys, "__bucket"], "left")
    if fill is not None:
        out = out.withColumns({
            o: F.coalesce(F.col(o), F.lit(fill).cast(
                "bigint" if aggs[o][0] == "count" else "double"))
            for o in aggs})
    return out.withColumnRenamed("__bucket", "bucket")
