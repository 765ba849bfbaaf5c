"""A/B: exact integer-cents revenue arithmetic vs decimal(18,2) multiply-sum.

VERDICT r9 #1: the 5 weak fact-aggregate rows (revenue_by_nation,
revenue_rollup, tpch q9/q16/q21) have shuffle-minimal plans but sit at
4-10x DuckDB; hypothesis is per-row decimal cost (double->decimal cast
allocates a java BigDecimal per value, the (18,2)x(18,2) multiply is
precision-37 so it leaves Spark's compact long representation, and the
sum buffer is a non-compact decimal(38,4)).

The cents formulation is EXACT for 2-dp money: price_cents =
round(price*100) as long, disc_pct = round(disc*100) as long, product
= price_cents * (100 - disc_pct) (a pure long multiply, <=1e9 per row)
and revenue = sum(product)/10^4 with the divide done ONCE in decimal at
the end (single double rounding, same as DuckDB's cast(sum as double)).

Usage: python scripts/ab_cents.py [sf_dir] [reps]
Prints per-variant wall times (min of reps, interleaved) for the
revenue_rollup shape (one scan, one agg — the purest probe of per-row
cost) plus a value-parity check of cents vs decimal at 6 dp.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def dec(c):
    return F.col(c).cast("decimal(18,2)")


def rev_dec():
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                     - dec("l_discount"))


def cents():
    return F.round(F.col("l_extendedprice") * 100).cast("long")


def pct():
    return F.round(F.col("l_discount") * 100).cast("long")


def prod_long():
    return (cents() * (F.lit(100) - pct())).alias("_p")


def v_decimal(li):
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(rev_dec()).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def v_cents_long(li):
    # long product, long sum, one exact decimal divide at the end
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(prod_long()).alias("_s"),
                 F.count(F.lit(1)).alias("n_items"))
            .select("l_returnflag", "l_linestatus",
                    (F.col("_s").cast("decimal(38,0)") / F.lit(10000))
                    .cast("double").alias("revenue"), "n_items"))


def v_cents_dec(li):
    # overflow-safe twin: product widened to decimal(28,0) before sum
    prod = (cents() * (F.lit(100) - pct())).cast("decimal(28,0)")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(prod).alias("_s"),
                 F.count(F.lit(1)).alias("n_items"))
            .select("l_returnflag", "l_linestatus",
                    (F.col("_s").cast("decimal(38,0)") / F.lit(10000))
                    .cast("double").alias("revenue"), "n_items"))


def v_cents_fast(li):
    # round() on a double routes through java BigDecimal per value —
    # for POSITIVE 2-dp money (x*100 + 0.5) floored by the long cast is
    # the same integer, in pure double+long codegen
    c = (F.col("l_extendedprice") * 100 + 0.5).cast("long")
    p = (F.col("l_discount") * 100 + 0.5).cast("long")
    prod = c * (F.lit(100) - p)
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(prod).alias("_s"),
                 F.count(F.lit(1)).alias("n_items"))
            .select("l_returnflag", "l_linestatus",
                    (F.col("_s").cast("decimal(38,0)") / F.lit(10000))
                    .cast("double").alias("revenue"), "n_items"))


def v_double(li):
    # NOT exact — floor reference for pure-double arithmetic cost
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def v_count_only(li):
    # absolute scan+agg floor: no per-row arithmetic at all
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_items")))


VARIANTS = {
    "decimal(18,2)": v_decimal,
    "cents_long": v_cents_long,
    "cents_dec28": v_cents_dec,
    "cents_fast": v_cents_fast,
    "double(inexact)": v_double,
    "count_only": v_count_only,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-cents")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()  # warm FS cache + executors

    best = {k: None for k in VARIANTS}
    for _ in range(reps):
        for name, fn in VARIANTS.items():  # interleaved
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(li).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = dt if best[name] is None else min(best[name], dt)
    for name, s in best.items():
        print(f"{name:18s} {s:7.3f}s", flush=True)

    # value parity: cents variants must equal decimal at 6 dp
    want = {(r["l_returnflag"], r["l_linestatus"]):
            (round(r["revenue"], 6), r["n_items"])
            for r in v_decimal(li).collect()}
    for name in ("cents_long", "cents_dec28", "cents_fast"):
        got = {(r["l_returnflag"], r["l_linestatus"]):
               (round(r["revenue"], 6), r["n_items"])
               for r in VARIANTS[name](li).collect()}
        print(f"parity {name}: {'OK' if got == want else 'MISMATCH'}")
        if got != want:
            for k in want:
                if got.get(k) != want[k]:
                    print("  ", k, want[k], "!=", got.get(k))
    spark.stop()


if __name__ == "__main__":
    main()
