"""A/B prototype: decomposed exact-distinct / fk subtrees for
expect_orders and profile_customer vs the current single-wide-agg shape.

The hypothesis (profile_expect_profile.py): embedding count(DISTINCT k)
in the wide aggregate re-keys the WHOLE aggregate by k (1 row per key
through the exchange, every conditional sum as partial state), and the
fk hit-marker join widens every fact row before the aggregate.  Moving
both into narrow 1-row sub-aggregates cross-joined onto the wide result
keeps one job but lets each subtree scan only its own column.

Usage: python scripts/ab_expect_decompose.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark import expectations as ex  # noqa: E402
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.relational import maybe_broadcast  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()

    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")

    def full_suite(exact=True):
        return ex.ExpectationSuite(checks=[
            ex.not_null("o_custkey"),
            ex.in_range("o_totalprice", 0, 400000, max_bad_frac=0.25),
            ex.in_set("o_orderstatus", ["F", "O"]),
            ex.matches("o_orderpriority", "^[1-5]-"),
            ex.unique("o_orderkey"),
            ex.row_count(1000, 1000000),
            ex.mean_between("o_totalprice", 200000, 300000),
            ex.fresh("o_orderdate", "2001-01-01"),
            ex.fk_in("o_custkey", cu, "c_custkey"),
        ], exact=exact)

    # ---- decomposed prototype (hand-built, same report rows) ----------
    def decomposed(exact=True):
        base = od
        # wide agg WITHOUT unique/fk, over the raw frame
        wide = base.agg(
            F.expr("count(1) AS _n"),
            F.expr("sum(CAST(NOT (o_custkey IS NOT NULL) AS BIGINT)) AS _m0"),
            F.expr("sum(CAST(NOT (o_totalprice IS NULL OR (o_totalprice >= 0.0 "
                   "AND o_totalprice <= 400000.0)) AS BIGINT)) AS _m1"),
            F.expr("sum(CAST(NOT (o_orderstatus IS NULL OR o_orderstatus IN "
                   "('F','O')) AS BIGINT)) AS _m2"),
            F.expr("sum(CAST(NOT (o_orderpriority IS NULL OR "
                   "CAST(o_orderpriority AS STRING) RLIKE '^[1-5]-') "
                   "AS BIGINT)) AS _m3"),
            F.expr("count(o_orderkey) AS _m4nn"),
            F.expr("CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) "
                   "/ count(o_totalprice) AS _m6"),
            F.expr("max(o_orderdate) AS _m7"),
        )
        # unique subtree: narrow scan of the key only
        dcnt = (F.expr("count(DISTINCT o_orderkey)") if exact
                else F.expr("approx_count_distinct(o_orderkey, 0.05)"))
        uq = base.select("o_orderkey").agg(dcnt.alias("_m4"))
        # fk subtree: narrow scan of the fk column + broadcast key probe
        keys = (cu.select(F.col("c_custkey").alias("_fk8"))
                .dropDuplicates().withColumn("_hit8", F.lit(1)))
        fk = (base.select("o_custkey")
              .join(maybe_broadcast(keys),
                    F.col("o_custkey") == F.col("_fk8"), "left")
              .agg(F.expr("sum(CAST((o_custkey IS NOT NULL AND _hit8 IS NULL)"
                          " AS BIGINT)) AS _m8")))
        return wide.crossJoin(F.broadcast(uq)).crossJoin(F.broadcast(fk))

    # ---- profile_customer decomposition --------------------------------
    from dataframe_pipeline_spark.profiling import profile

    def profile_decomposed():
        cols = ["c_custkey", "c_acctbal", "c_mktsegment"]
        wide = cu.agg(
            F.count(F.lit(1)).alias("__n_rows"),
            F.count("c_custkey").alias("__nn_c_custkey"),
            F.min("c_custkey").cast("double").alias("__min_c_custkey"),
            F.max("c_custkey").cast("double").alias("__max_c_custkey"),
            F.avg("c_custkey").alias("__mean_c_custkey"),
            F.count("c_acctbal").alias("__nn_c_acctbal"),
            F.min("c_acctbal").cast("double").alias("__min_c_acctbal"),
            F.max("c_acctbal").cast("double").alias("__max_c_acctbal"),
            F.avg("c_acctbal").alias("__mean_c_acctbal"),
            F.count("c_mktsegment").alias("__nn_c_mktsegment"),
            F.min("c_mktsegment").alias("__smin_c_mktsegment"),
            F.max("c_mktsegment").alias("__smax_c_mktsegment"),
        )
        for c in cols:
            d = cu.select(c).agg(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
            wide = wide.crossJoin(F.broadcast(d))
        return wide

    # warm
    noop(od.agg(F.count(F.lit(1))))

    cases = [
        ("expect exact CURRENT", lambda: noop(full_suite(True).report(od))),
        ("expect exact DECOMPOSED", lambda: noop(decomposed(True))),
        ("expect hll CURRENT", lambda: noop(full_suite(False).report(od))),
        ("expect hll DECOMPOSED", lambda: noop(decomposed(False))),
        ("profile exact CURRENT",
         lambda: noop(profile(cu, ["c_custkey", "c_acctbal", "c_mktsegment"],
                              exact=True))),
        ("profile exact DECOMPOSED", lambda: noop(profile_decomposed())),
    ]
    best = {lbl: float("inf") for lbl, _ in cases}
    for _ in range(reps):
        for lbl, fn in cases:
            spark.sparkContext.setJobDescription(lbl)
            t0 = time.perf_counter()
            fn()
            best[lbl] = min(best[lbl], time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    for lbl in best:
        print(f"{lbl:30} {best[lbl]:7.3f}s", flush=True)

    # value check: decomposed wide numbers equal the current report's
    cur = {r["check"]: r.asDict() for r in full_suite(True).report(od).collect()}
    dec = decomposed(True).collect()[0].asDict()
    assert dec["_m4"] == cur["unique(o_orderkey)"]["observed"], (dec, cur)
    assert dec["_m8"] == cur["fk_in(o_custkey)"]["n_bad"], (dec, cur)
    assert dec["_n"] == cur["row_count"]["observed"]
    print("value check OK")


if __name__ == "__main__":
    main()
