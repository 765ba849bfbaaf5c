"""Floor profile for the weak fact-aggregate rows (VERDICT r9 #1).

For each weak query, times THREE plans in one session, interleaved,
min of N:

  full    — the registered query (gated integer-cents arithmetic, r10)
  noarith — the SAME join/group shape summing a constant (1L): what the
            query would cost with zero per-row money arithmetic
  floor   — bare scan + count per group key (no joins): Spark's
            scan+agg floor for the fact table

plus a DuckDB canary (the revenue_rollup oracle) per repetition, so
the numbers can be machine-normalized.  If full ≈ noarith, the
residual is join/launch floor, not arithmetic — the named-exemption
evidence VERDICT r9 asked for.

Usage: python scripts/profile_weak.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark.ext_queries import (  # noqa: E402
    q_revenue_by_nation, q_revenue_rollup, q_top_revenue_orders,
    q_tpch_pricing_summary)
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.relational import (  # noqa: E402
    maybe_broadcast, maybe_shuffle_hash)
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.tpch import q_tpch_q9_profit  # noqa: E402


def noarith_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    base = (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.lit(1)).alias("_r"), F.count(F.lit(1)).alias("_n")))
    return (base.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum("_r").alias("_r2"), F.sum("_n").alias("n_items")))


def noarith_by_nation(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    od_scan = _t(spark, sf_dir, "orders")
    od = od_scan.select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem")
    li_pre = (li.groupBy("l_orderkey")
              .agg(F.sum(F.lit(1)).alias("_r"),
                   F.count(F.lit(1)).alias("_n")))
    dim = (od.join(maybe_broadcast(cu), od.o_custkey == cu.c_custkey)
           .select("o_orderkey", "c_nationkey"))
    return (maybe_shuffle_hash(li_pre, bound_df=od_scan)
            .join(dim, li_pre.l_orderkey == dim.o_orderkey)
            .groupBy("c_nationkey")
            .agg(F.sum("_r").alias("_r"), F.sum("_n").alias("_n")))


def noarith_q9(spark, sf_dir):
    from dataframe_pipeline_spark.tpch import _Q9_PATTERN
    pt = (_t(spark, sf_dir, "part")
          .filter(F.col("p_name").contains(_Q9_PATTERN))
          .select("p_partkey"))
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    su = (_t(spark, sf_dir, "supplier")
          .join(maybe_broadcast(na),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", "n_name"))
    od_scan = _t(spark, sf_dir, "orders")
    od = od_scan.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    li = _t(spark, sf_dir, "lineitem")
    fact = (li.join(maybe_broadcast(pt), li.l_partkey == pt.p_partkey)
            .join(maybe_broadcast(su), li.l_suppkey == su.s_suppkey)
            .select("l_orderkey", "n_name", F.lit(1).alias("_rv")))
    return (fact.join(maybe_shuffle_hash(od, bound_df=od_scan),
                      fact.l_orderkey == od.o_orderkey)
            .groupBy("n_name", "o_year")
            .agg(F.sum("_rv").alias("_r")))


def noarith_top_orders(spark, sf_dir):
    cu = (_t(spark, sf_dir, "customer")
          .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    od_b = (od.join(maybe_broadcast(cu), od.o_custkey == cu.c_custkey,
                    "left_semi").select("o_orderkey", "o_orderdate"))
    return (li.join(od_b, li.l_orderkey == od_b.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.sum(F.lit(1)).alias("_r"))
            .orderBy(F.desc("_r"), F.asc("o_orderkey")).limit(10))


def noarith_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate")
                      <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.lit(1)).alias("_sq"),
                 F.count(F.lit(1)).alias("count_order")))


def floor_scan(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n")))


CASES = {
    "revenue_rollup": (q_revenue_rollup, noarith_rollup),
    "revenue_by_nation": (q_revenue_by_nation, noarith_by_nation),
    "tpch_q9_profit": (q_tpch_q9_profit, noarith_q9),
    "top_revenue_orders": (q_top_revenue_orders, noarith_top_orders),
    "tpch_pricing_summary": (q_tpch_pricing_summary, noarith_pricing),
}

CANARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS r,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("profile-weak")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")

    plans = {"floor_scan_only": (lambda s, d: floor_scan(s, d), None)}
    best: dict[str, float] = {}
    canary = None
    for rep in range(reps):
        t0 = time.perf_counter()
        con.execute(CANARY_SQL).fetchall()
        dt = time.perf_counter() - t0
        canary = dt if canary is None else min(canary, dt)
        for name, (full, noar) in CASES.items():
            for tag, fn in (("full", full), ("noarith", noar)):
                key = f"{name}/{tag}"
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best[key] = min(best.get(key, 1e9), dt)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        floor_scan(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best["floor_scan_only"] = min(best.get("floor_scan_only", 1e9),
                                      time.perf_counter() - t0)

    print(f"duckdb_canary(rollup oracle): {canary:.3f}s")
    print(f"{'floor_scan_only':34s} {best['floor_scan_only']:7.3f}s")
    for name in CASES:
        f, n = best[f"{name}/full"], best[f"{name}/noarith"]
        print(f"{name:34s} full={f:7.3f}s noarith={n:7.3f}s "
              f"arith_residual={f - n:+.3f}s")
    out = os.environ.get("PROFILE_WEAK_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "reps": reps,
                       "duckdb_canary_s": round(canary, 3),
                       "best_s": {k: round(v, 3) for k, v in best.items()}},
                      fh, indent=1)
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
