"""Timing probe for the encoder-fit fusion A/B: run the three
encoder-backed registry queries N times in one session (noop sink,
fit included — same timed region as the comparator) and print mins.

Run from BOTH trees (pre-change worktree and HEAD) back-to-back:
    python scripts/ab_encoder_fit.py <sf_dir> <reps>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

NAMES = ["target_encode", "target_encode_cv", "woe_encode"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("ab-encoder-fit")
    spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    qs = entrymod.queries()
    times = {n: [] for n in NAMES}
    for r in range(reps):
        for n in NAMES:
            spark.sparkContext.setJobDescription(f"ab_encoder_fit {n} r{r}")
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[n].append(time.perf_counter() - t0)
    for n in NAMES:
        ts = times[n]
        print(f"{n:18s} min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
