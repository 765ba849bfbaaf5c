"""A/B harness for the round-12 events/text-band rewrites (VERDICT r11
items #2/#3).

Times, in ONE session, interleaved, min of N:

  events_latest/window     — the pre-r12 row_number() window plan
  events_latest/structmax  — the registered hash-aggregate rewrite
                             (max(struct(ts, event_id, value)))
  salted_auto/exact_probe  — q_join_salted_auto with the full-fact
                             gate probe (sample_fraction=1.0)
  salted_auto/sampled      — same query with the now-default seeded
                             1e-3 sampled probe

Usage: python scripts/ab_events_band.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from dataframe_pipeline_spark.ext_queries import (  # noqa: E402
    _events, _fin4, _long_sum_ok, _rev4, q_events_latest)
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.relational import maybe_salted_join  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def events_latest_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("event_id", "user_id", "event_type", "value"))


def _salted_auto(sample_fraction):
    def q(spark, sf_dir):
        li = _t(spark, sf_dir, "lineitem")
        od = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority")
        if _long_sum_ok(li):
            rev, fin = _rev4(), _fin4
        else:
            raise RuntimeError("expected fast path at bench scale")
        j = maybe_salted_join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), od,
            on="o_orderkey", how="inner", n_salts=8,
            salt_src=["o_orderkey", "l_linenumber"],
            sample_fraction=sample_fraction)
        return (j.groupBy("o_orderpriority")
                .agg(F.sum(rev).alias("_r"),
                     F.count(F.lit(1)).alias("n_items"))
                .select("o_orderpriority", fin(F.col("_r")).alias("revenue"),
                        "n_items"))
    return q


CASES = {
    "events_latest/window": events_latest_window,
    "events_latest/structmax": q_events_latest,
    "salted_auto/exact_probe": _salted_auto(1.0),
    "salted_auto/sampled": _salted_auto(None),
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-events-band")
    # warm scans + python workers once, outside the timed loops
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in CASES.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, 1e9),
                             time.perf_counter() - t0)
    for name, v in best.items():
        print(f"{name:28s} {v:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
