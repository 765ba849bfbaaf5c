"""A/B: TPC-H Q4 EXISTS shape (guide §3.2: broadcast the side that fits).

Current shape (A): quarter-pruned orders LEFT SEMI lineitem.  Spark can
only broadcast the BUILD side of a semi join, which is lineitem (the
full fact) — so the semi join always becomes SMJ/SHJ and shuffles every
(l_orderkey, l_shipdate) row of lineitem.

Candidate (B): when the pruned orders side passes the size gate,
broadcast it into an INNER join on lineitem (map-side, no fact shuffle),
then collapse to one row per order with a (o_orderkey) hash aggregate —
partial aggregation shrinks each task's output to the ~57k surviving
keys before the only exchange.  Past the gate (100 TB) the branch falls
back to the semi join, which shuffles strictly less than inner+distinct.

Equivalence: EXISTS keeps each pruned order at most once; inner join
emits one row per late lineitem, and the (o_orderkey) aggregate keeps
exactly the orders with >=1 match, once each; o_orderpriority is
functionally dependent on the unique o_orderkey, so adding it to the
distinct key changes nothing (and keeps the collapse hash-based).

Usage: python scripts/ab_q4.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframe_pipeline_spark.relational import (DIM_BROADCAST_MAX_BYTES,
                                                 stats_bytes)
from dataframe_pipeline_spark.session import get_spark
from dataframe_pipeline_spark.tpch import _t


def q_a(spark, sf_dir):
    """Frozen copy of the pre-r12 registry shape (unconditional semi)."""
    od = (_t(spark, sf_dir, "orders")
          .filter((F.col("o_orderdate")
                   >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("o_orderdate")
                     < F.lit("1996-04-01").cast("timestamp"))))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = od.join(
        li,
        (od.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > od.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def q_b(spark, sf_dir):
    od = (_t(spark, sf_dir, "orders")
          .filter((F.col("o_orderdate")
                   >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("o_orderdate")
                     < F.lit("1996-04-01").cast("timestamp")))
          .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond_join = (F.col("o_orderkey") == F.col("l_orderkey"))
    late_cond = (F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    if stats_bytes(od) <= DIM_BROADCAST_MAX_BYTES:
        late = (li.join(F.broadcast(od), cond_join & late_cond)
                .select("o_orderkey", "o_orderpriority")
                .dropDuplicates())
    else:
        late = od.join(li, cond_join & late_cond, "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-q4")

    for small in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = sorted(map(tuple, q_a(spark, small).collect()))
        b = sorted(map(tuple, q_b(spark, small).collect()))
        assert a == b, f"MISMATCH at {small}: a={a} b={b}"
        print(f"equality OK at {small}: {len(a)} rows identical")

    times = {"A_semi_join": [], "B_bcast_inner_agg": []}
    for r in range(reps):
        for name, fn in (("A_semi_join", q_a),
                         ("B_bcast_inner_agg", q_b)):
            spark.sparkContext.setJobDescription(f"ab_q4 {name} r{r}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            noop(df)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
