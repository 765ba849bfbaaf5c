"""A/B harness for round-11 weak-row rewrites (VERDICT r10 #1).

Times the REGISTERED q11/q21 implementations against rewrite candidates
in one session, interleaved, min of N — the same discipline as
scripts/ab_cents.py.  Candidates:

  q11_window   — drop the eager localCheckpoint + second job + crossJoin;
                 compute the global total as an empty-frame window over
                 the per-part aggregate (one job, one fact scan, the
                 window exchange is |part| narrow rows to 1 partition).
  q21_agg      — replace the per-order window (sort-based WindowExec)
                 with a second hash aggregate at order grain.
  q21_onepart  — same, but repartition the joined fact ONCE on
                 l_orderkey so both aggregates are exchange-free
                 (hashpartitioning(orderkey) satisfies the clustered
                 distribution of (orderkey, suppkey) and (orderkey)).

Usage: python scripts/ab_weak_rewrites.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.relational import maybe_broadcast  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.tpch import (  # noqa: E402
    _Q11_FRACTION, _Q11_NATION, _rev_plan, q_tpch_q11_value,
    q_tpch_q21_waiting)


def q11_window(spark, sf_dir):
    na = (_t(spark, sf_dir, "nation")
          .filter(F.col("n_name") == _Q11_NATION).select("n_nationkey"))
    su = (_t(spark, sf_dir, "supplier")
          .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
          .select("s_suppkey"))
    li_scan = _t(spark, sf_dir, "lineitem")
    rv, fin = _rev_plan(li_scan)
    li = (li_scan
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(maybe_broadcast(su), F.col("l_suppkey") == su.s_suppkey,
                "left_semi"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rv).alias("_val"))
    w = Window.partitionBy()
    return (per_part
            .withColumn("_tot", F.sum("_val").over(w))
            .filter(fin(F.col("_val"))
                    > F.lit(_Q11_FRACTION) * fin(F.col("_tot")))
            .select(F.col("l_partkey").alias("p_partkey"),
                    fin(F.col("_val")).alias("part_value"))
            .orderBy(F.desc("part_value"), F.asc("p_partkey")))


def _q21_flagged(spark, sf_dir):
    od_scan = _t(spark, sf_dir, "orders")
    od = (od_scan.filter(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_orderdate"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    return (li.join(maybe_broadcast(od, bound_df=od_scan),
                    li.l_orderkey == od.o_orderkey)
            .select("l_orderkey", "l_suppkey",
                    (F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                    .cast("int").alias("_late")))


def _q21_finish(spark, sf_dir, per_pair):
    per_order = (per_pair.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("n_supp"),
                      F.sum((F.col("late_rows") > 0).cast("int"))
                      .alias("n_late"),
                      F.max(F.when(F.col("late_rows") > 0,
                                   F.col("l_suppkey"))).alias("late_supp"),
                      F.sum(F.when(F.col("late_rows") > 0,
                                   F.col("late_rows")))
                      .alias("late_rows_sum")))
    waiting = per_order.filter((F.col("n_late") == 1)
                               & (F.col("n_supp") > 1))
    su = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (waiting.groupBy("late_supp")
            .agg(F.sum("late_rows_sum").alias("numwait"))
            .join(maybe_broadcast(su), F.col("late_supp") == su.s_suppkey)
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(20))


def q21_agg(spark, sf_dir):
    flagged = _q21_flagged(spark, sf_dir)
    per_pair = (flagged.groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum("_late").alias("late_rows")))
    return _q21_finish(spark, sf_dir, per_pair)


def q21_onepart(spark, sf_dir):
    flagged = _q21_flagged(spark, sf_dir).repartition(F.col("l_orderkey"))
    per_pair = (flagged.groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum("_late").alias("late_rows")))
    return _q21_finish(spark, sf_dir, per_pair)


def q21_shj(spark, sf_dir):
    """Shuffle-hash the orders join on l_orderkey: the join OUTPUT is
    then hashpartitioning(l_orderkey), so both aggregates run with no
    further exchange — trades the 750k-row driver broadcast build for
    a 750k-row shuffle of the orders side."""
    from dataframe_pipeline_spark.relational import maybe_shuffle_hash

    od_scan = _t(spark, sf_dir, "orders")
    od = (od_scan.filter(F.col("o_orderstatus") == "F")
          .select("o_orderkey", "o_orderdate"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    flagged = (li.join(maybe_shuffle_hash(od, bound_df=od_scan),
                       li.l_orderkey == od.o_orderkey)
               .select("l_orderkey", "l_suppkey",
                       (F.col("l_shipdate")
                        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                       .cast("int").alias("_late")))
    per_pair = (flagged.groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum("_late").alias("late_rows")))
    return _q21_finish(spark, sf_dir, per_pair)


CASES = {
    "q11_current": q_tpch_q11_value,
    "q11_window": q11_window,
    "q21_current": q_tpch_q21_waiting,
    "q21_agg": q21_agg,
    "q21_onepart": q21_onepart,
    "q21_shj": q21_shj,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-weak")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # value parity first — a faster wrong answer is not a candidate
    for pair in (("q11_current", "q11_window"),
                 ("q21_current", "q21_agg"),
                 ("q21_current", "q21_onepart"),
                 ("q21_current", "q21_shj")):
        a = sorted(map(tuple, CASES[pair[0]](spark, sf_dir).collect()))
        b = sorted(map(tuple, CASES[pair[1]](spark, sf_dir).collect()))
        assert a == b, f"value mismatch {pair}: {a[:3]} vs {b[:3]}"
        print(f"parity OK: {pair[0]} == {pair[1]} ({len(a)} rows)")

    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in CASES.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, 1e9),
                             time.perf_counter() - t0)
    for name, v in best.items():
        print(f"{name:14s} {v:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
