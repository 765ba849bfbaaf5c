"""A/B: TPC-H Q13 join shape (guide §2.2/§3.1).

Current shape (A): customer LEFT JOIN filtered orders, then
groupBy(c_custkey), then groupBy(c_count).  The outer join shuffles BOTH
full inputs (customer 150k rows + filtered orders ~1.4M rows at sf1) and
the per-customer aggregate runs over the ~1.4M joined rows.

Candidate (B): pre-aggregate orders by o_custkey FIRST — partial
aggregation shrinks the shuffle to one row per (partition, custkey) —
then customer LEFT JOIN the pre-aggregate with coalesce(cnt, 0).  The
pre-aggregate is bounded by |customer| (FK), so it takes the size-gated
broadcast: the customer side then never shuffles at all.

Equivalence: count(o_orderkey) over the outer join counts non-NULL
o_orderkey per customer = number of matching order rows, 0 when the
customer matched nothing.  coalesce(pre_agg_count, 0) is the same number
by definition; c_count stays BIGINT on both paths.

Usage: python scripts/ab_q13.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframe_pipeline_spark.relational import maybe_broadcast
from dataframe_pipeline_spark.session import get_spark
from dataframe_pipeline_spark.tpch import _t


def q_a(spark, sf_dir):
    """Frozen copy of the pre-r12 registry shape (outer join first)."""
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    od = (_t(spark, sf_dir, "orders")
          .filter(F.col("o_orderpriority") != "5-LOW")
          .select("o_orderkey", "o_custkey"))
    per_cust = (cu.join(od, cu.c_custkey == od.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


def q_b(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    od = (_t(spark, sf_dir, "orders")
          .filter(F.col("o_orderpriority") != "5-LOW")
          .select("o_custkey"))
    per_key = (od.groupBy("o_custkey")
               .agg(F.count(F.lit(1)).alias("_n")))
    per_cust = (cu.join(maybe_broadcast(per_key, bound_df=cu),
                        cu.c_custkey == per_key.o_custkey, "left")
                .select(F.coalesce(F.col("_n"), F.lit(0).cast("long"))
                        .alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-q13")

    for small in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = sorted(map(tuple, q_a(spark, small).collect()))
        b = sorted(map(tuple, q_b(spark, small).collect()))
        assert a == b, f"MISMATCH at {small}: a={a[:5]} b={b[:5]}"
        print(f"equality OK at {small}: {len(a)} rows identical")

    times = {"A_outer_join_then_agg": [], "B_preagg_then_join": []}
    for r in range(reps):
        for name, fn in (("A_outer_join_then_agg", q_a),
                         ("B_preagg_then_join", q_b)):
            spark.sparkContext.setJobDescription(f"ab_q13 {name} r{r}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            noop(df)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
