"""Scan-width-honest floor twins for target_encode / target_encode_cv
(VERDICT r12 #5 fallback arm: the rows stay >2x DuckDB at sf1 after the
Fix-3 one-collect fit, so commit the twin naming the floor).

Twins time the two UNAVOIDABLE jobs with zero operator machinery:

  fit_scan   — the grouped (cat[, fold]) count/sum aggregate over the
               same columns, materialized (localCheckpoint), exactly
               the operator's training pass
  transform  — scan + broadcast join against the 5-row (20-row CV)
               lookup + the rounded output projection, noop sink

full ≈ fit_scan + transform (+ one tiny collect) means the operator
adds nothing over its own shape; the residual vs DuckDB at this SF is
Spark per-job launch cost (DuckDB runs the whole CTE in-process with
no job machinery), not a missing rewrite.

Usage: python scripts/profile_target_encode_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("profile-te-r13")
    qs = entrymod.queries()
    cu = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    cu.count()
    t = F.col("c_acctbal").cast("double")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def fit_scan():
        (cu.groupBy(F.col("c_mktsegment").alias("__cat"))
         .agg(F.count(t).alias("__n"), F.sum(t).alias("__s"))
         .localCheckpoint())

    stats = (cu.groupBy(F.col("c_mktsegment").alias("__cat"))
             .agg(F.count(t).alias("__n"), F.sum(t).alias("__s"))
             .localCheckpoint())
    tot = stats.agg(F.sum("__n").alias("n"), F.sum("__s").alias("s")).collect()[0]
    g = float(tot["s"]) / float(tot["n"])
    lk = (stats.filter(F.col("__cat").isNotNull())
          .select("__cat", ((F.col("__n") * (F.col("__s") / F.col("__n"))
                             + F.lit(20.0) * F.lit(g))
                            / (F.col("__n") + F.lit(20.0))).alias("__code")))

    def transform():
        noop(cu.join(F.broadcast(lk), cu.c_mktsegment == F.col("__cat"),
                     "left")
             .withColumn("seg_code", F.coalesce(F.col("__code"), F.lit(g)))
             .select("c_custkey", F.round("seg_code", 6).alias("seg_code")))

    plans = {
        "target_encode/full": lambda: noop(qs["target_encode"](spark, sf_dir)),
        "target_encode/fit_scan": fit_scan,
        "target_encode/transform": transform,
        "target_encode_cv/full": lambda: noop(
            qs["target_encode_cv"](spark, sf_dir)),
    }
    best: dict[str, float] = {}
    for rep in range(reps):
        for name, fn in plans.items():
            t0 = time.perf_counter()
            fn()
            best[name] = min(best.get(name, 1e9), time.perf_counter() - t0)
    out = {"sf_dir": sf_dir, "reps": reps,
           "best_s": {k: round(v, 3) for k, v in best.items()}}
    with open("PROFILE_WEAK_r13_sf1.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["best_s"], indent=1))
    print("wrote PROFILE_WEAK_r13_sf1.json")


if __name__ == "__main__":
    main()
