"""A/B: resample's dense-grid construction (guide §2.4).

Current shape (A): sparse agg -> per-key min/max agg -> sequence-explode
spine -> LEFT JOIN sparse on (key, bucket).  The sparse aggregate subtree
feeds two consumers, and the join adds exchanges on (key, bucket).

Candidate (B): one window over the sparse agg — lag(bucket) per key, then
explode(sequence(prev+step .. bucket)) emits each gap's fill rows together
with the real row.  Same row set by construction (every bucket in
[min, max] lies in exactly one (prev, cur] interval), one exchange after
the sparse agg, no join, no second derivation of the fact aggregate.

Usage: python scripts/ab_resample.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataframe_pipeline_spark.ext_queries import _events
from dataframe_pipeline_spark.session import get_spark
from dataframe_pipeline_spark.timeseries import resample


def resample_gapfill(df: DataFrame, key, ts_col, step_seconds, aggs,
                     fill=0) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    step = F.lit(int(step_seconds))
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step)
    agg_exprs = []
    for out, (func, src) in aggs.items():
        if func == "sum":
            agg_exprs.append(F.sum(F.col(src).cast("decimal(28,6)"))
                             .cast("double").alias(out))
        else:
            agg_exprs.append(F.count(F.col(src)).alias(out))
    sparse = (df.withColumn("__bucket", bucket)
              .groupBy(*keys, "__bucket").agg(*agg_exprs))
    w = Window.partitionBy(*keys).orderBy("__bucket")
    s = int(step_seconds)
    filled = (sparse
              .withColumn("__prev", F.lag("__bucket").over(w))
              .withColumn("__b", F.explode(F.expr(
                  f"sequence(coalesce(__prev + interval {s} second, "
                  f"__bucket), __bucket, interval {s} second)"))))
    cols = []
    for out, (func, _src) in aggs.items():
        v = F.when(F.col("__b") == F.col("__bucket"), F.col(out))
        if fill is not None:
            v = F.coalesce(v, F.lit(fill).cast(
                "bigint" if func == "count" else "double"))
        cols.append(v.alias(out))
    return filled.select(*keys, F.col("__b").alias("bucket"), *cols)


def q_a(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = resample(ev, key="user_id", ts_col="ts", step_seconds=86400,
                   aggs={"n_events": ("count", "event_id"),
                         "value_total": ("sum", "value")})
    return out.select("user_id", "bucket", "n_events",
                      F.round("value_total", 6).alias("value_total"))


def q_b(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = resample_gapfill(ev, key="user_id", ts_col="ts",
                           step_seconds=86400,
                           aggs={"n_events": ("count", "event_id"),
                                 "value_total": ("sum", "value")})
    return out.select("user_id", "bucket", "n_events",
                      F.round("value_total", 6).alias("value_total"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-resample")

    # equality check at sf0.01
    small = "/root/testdata/sf0.01"
    a = sorted(map(tuple, q_a(spark, small).collect()))
    b = sorted(map(tuple, q_b(spark, small).collect()))
    assert a == b, f"MISMATCH rows a={len(a)} b={len(b)}"
    print(f"equality OK at sf0.01: {len(a)} rows identical")

    times = {"A_spine_join": [], "B_gapfill": []}
    for r in range(reps):
        for name, fn in (("A_spine_join", q_a), ("B_gapfill", q_b)):
            spark.sparkContext.setJobDescription(f"ab_resample {name} r{r}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            noop(df)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
