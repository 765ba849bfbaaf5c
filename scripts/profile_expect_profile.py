"""Ad-hoc decomposition profile for the expect_orders / profile_customer
sf1 comparator rows: where does the wall go — the exact-distinct Expand,
the fk broadcast probe, or the scan itself?

Usage: python scripts/profile_expect_profile.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark import expectations as ex  # noqa: E402
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_min(spark, label, fn, reps):
    best = float("inf")
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark()

    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")

    def suite(checks, exact=True):
        return ex.ExpectationSuite(checks=checks, exact=exact)

    full_checks = [
        ex.not_null("o_custkey"),
        ex.in_range("o_totalprice", 0, 400000, max_bad_frac=0.25),
        ex.in_set("o_orderstatus", ["F", "O"]),
        ex.matches("o_orderpriority", "^[1-5]-"),
        ex.unique("o_orderkey"),
        ex.row_count(1000, 1000000),
        ex.mean_between("o_totalprice", 200000, 300000),
        ex.fresh("o_orderdate", "2001-01-01"),
        ex.fk_in("o_custkey", cu, "c_custkey"),
    ]
    no_unique = [c for c in full_checks if c.kind != "unique"]
    no_fk = [c for c in full_checks if c.kind != "fk_in"]
    no_both = [c for c in full_checks if c.kind not in ("unique", "fk_in")]

    cases = [
        ("expect_orders FULL exact", lambda: noop(suite(full_checks).report(od))),
        ("  - without unique", lambda: noop(suite(no_unique).report(od))),
        ("  - without fk", lambda: noop(suite(no_fk).report(od))),
        ("  - without both", lambda: noop(suite(no_both).report(od))),
        ("  distinct-only narrow scan",
         lambda: noop(od.select("o_orderkey").agg(
             F.count_distinct("o_orderkey").alias("d"),
             F.count("o_orderkey").alias("nn")))),
        ("  orders scan floor",
         lambda: noop(od.select("o_orderkey").agg(F.count(F.lit(1))))),
    ]

    from dataframe_pipeline_spark.profiling import profile
    cases += [
        ("profile_customer exact",
         lambda: noop(profile(cu, ["c_custkey", "c_acctbal", "c_mktsegment"],
                              exact=True))),
        ("profile_customer approx",
         lambda: noop(profile(cu, ["c_custkey", "c_acctbal", "c_mktsegment"]))),
        ("  customer scan floor",
         lambda: noop(cu.select("c_custkey", "c_acctbal", "c_mktsegment")
                      .agg(F.count(F.lit(1))))),
        ("  3 separate exact distincts crossjoined",
         lambda: noop(
             cu.agg(F.count_distinct("c_custkey").alias("d1"))
             .crossJoin(cu.agg(F.count_distinct("c_acctbal").alias("d2")))
             .crossJoin(cu.agg(F.count_distinct("c_mktsegment").alias("d3"))))),
    ]

    # warm the session once
    noop(od.agg(F.count(F.lit(1))))
    for label, fn in cases:
        t = time_min(spark, label, fn, reps)
        print(f"{label:45} {t:7.3f}s", flush=True)


if __name__ == "__main__":
    main()
