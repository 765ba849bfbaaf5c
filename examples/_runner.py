"""Shared example runner: load a testdata table, run a pipeline, report."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run(name, build_pipeline, table="lineitem", prep=None, explain=False):
    """build_pipeline(df) -> DataframePipeline; prep(df) -> df (optional)."""
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    spark = get_spark(name)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if prep is not None:
        df = prep(df)
    pipe = build_pipeline(df)
    t0 = time.perf_counter()
    out = pipe.fit_transform(df)
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    print(f"[{name}] fit_transform over {table}@{sf_dir}: "
          f"{out.count()} rows x {len(out.columns)} cols in {elapsed:.2f}s")
    out.show(5, truncate=14)
    if explain or os.environ.get("DFP_EXPLAIN"):
        out.explain("formatted")
    spark.stop()
    return out
