"""Floor decomposition for the remaining sf1 over-2x TPC-H rows
(VERDICT r12 #4: q10, q12, q18, q20 — q13/q17 already rewritten).

For each row, times the FULL registered query against structural
decomposition twins in one session, interleaved, min of N:

  q10: full | li_scan (R-filtered scan of the same columns, grouped by
       returnflag — no join/exchange) | join_agg (the per-custkey
       aggregate without the dim joins / top-k)
  q12: full | li_scan + od_scan (the two pruned scans, no exchange) |
       join_count (same fact-fact join, count only — arithmetic-free)
  q18: full | preagg (the l_orderkey HAVING aggregate alone — the one
       big exchange) — the dim joins ride on the tiny survivor set
  q20: full | preagg (the semi-filtered per-suppkey aggregate alone)

If full ~= its dominant twin, the row is at its structural floor (the
exchange/scan the semantics require) and the residual vs DuckDB is
per-job overhead at this SF, not a missing rewrite.

Usage: python scripts/profile_tpch_band_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.relational import maybe_broadcast  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.tpch import (  # noqa: E402
    _Q18_QTY, _Q20_PATTERN, _dec, _long_sum_ok, _rev4)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("profile-tpch-r13")
    qs = entrymod.queries()
    for t in ["lineitem", "orders", "customer", "nation", "part",
              "supplier"]:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    rev = _rev4() if _long_sum_ok(li) else (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))

    def q10_li_scan():
        noop(li.filter(F.col("l_returnflag") == "R")
             .groupBy("l_returnflag").agg(F.sum(rev).alias("_r")))

    def q10_join_agg():
        o = (od.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
            .select("o_orderkey", "o_custkey"))
        l = li.filter(F.col("l_returnflag") == "R")
        noop(l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy("o_custkey").agg(F.sum(rev).alias("_r")))

    def q12_scans():
        noop(li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .select("l_orderkey", "l_linestatus")
            .groupBy("l_linestatus").count())
        noop(od.select("o_orderkey", "o_orderpriority")
             .groupBy("o_orderpriority").count())

    def q12_join_count():
        l = (li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .select("l_orderkey", "l_linestatus"))
        o = od.select("o_orderkey", "o_orderpriority")
        noop(l.join(o, l.l_orderkey == o.o_orderkey)
             .agg(F.count(F.lit(1))))

    def q18_preagg():
        noop(li.select("l_orderkey", "l_quantity")
             .groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("sum_qty"))
             .filter(F.col("sum_qty") > _Q18_QTY))

    def q20_preagg():
        pt = (_t(spark, sf_dir, "part")
              .filter(F.col("p_name").contains(_Q20_PATTERN))
              .select("p_partkey"))
        l = (li.select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
             .join(maybe_broadcast(pt), F.col("l_partkey") == pt.p_partkey,
                   "left_semi"))
        in_97 = ((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
        noop(l.groupBy("l_suppkey")
             .agg(F.sum(F.when(in_97, F.col("l_quantity"))
                        .otherwise(F.lit(0.0))).alias("qty_97"),
                  F.sum("l_quantity").alias("qty_all")))

    plans = {
        "tpch_q10_returns/full": lambda: noop(
            qs["tpch_q10_returns"](spark, sf_dir)),
        "tpch_q10_returns/li_scan": q10_li_scan,
        "tpch_q10_returns/join_agg": q10_join_agg,
        "tpch_q12_priority_class/full": lambda: noop(
            qs["tpch_q12_priority_class"](spark, sf_dir)),
        "tpch_q12_priority_class/scans": q12_scans,
        "tpch_q12_priority_class/join_count": q12_join_count,
        "tpch_q18_large_orders/full": lambda: noop(
            qs["tpch_q18_large_orders"](spark, sf_dir)),
        "tpch_q18_large_orders/preagg": q18_preagg,
        "tpch_q20_excess/full": lambda: noop(
            qs["tpch_q20_excess"](spark, sf_dir)),
        "tpch_q20_excess/preagg": q20_preagg,
    }

    best: dict[str, float] = {}
    for rep in range(reps):
        for name, fn in plans.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
        print(f"rep {rep}: " + " ".join(
            f"{n.split('/')[0][8:12]}/{n.split('/')[1]}={best[n]:.3f}"
            for n in plans), flush=True)

    out = {"sf_dir": sf_dir, "reps": reps,
           "best_s": {k: round(v, 3) for k, v in best.items()}}
    dest = os.environ.get("PROFILE_OUT", "PROFILE_TPCH_r13.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["best_s"], indent=1))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
