"""A/B: can embed_normalize's per-element arithmetic leave the
interpreted higher-order-function path?  (guide §1.2 — know the engine
floor before calling a residual semantic.)

Spark HOFs (transform/aggregate) are CodegenFallback — every element
of every row pays interpreted expression eval, which the committed
twin isolates as ~+1.4 s at sf1 over the raw-posexplode floor.  Two
unrolled fixed-dim (64) candidates tried:

B  = inline 64-term expressions, two-project let-bind of the norm.
     Result: WSCG FAILS TO COMPILE (janino InternalCompilerException
     in processNext()) and the whole stage falls back to interpreted;
     worse, InferFiltersFromGenerate pushes a size(array(<64 round
     exprs>)) filter into the SCAN, so the giant tree is evaluated
     TWICE per row interpreted — pathologically slow at sf1 (killed
     after >10 min for 4 reps vs A's ~1.7 s).

D  = column-split (q0..q63 as real columns -> __nrm -> array):
     Catalyst re-inlines/propagates constraints over the unrolled
     tree and the DRIVER OOMs at 8g during optimization of the
     sf0.01 equality probe — never reaches execution.

Both candidates are row-identical to the production shape where they
ran (B verified frame-equal at sf0.01 before timing).  Conclusion:
at dim=64 on Spark 4.1.2 the nested-lambda let-bind shape in
`similarity.VectorNormalizer` is the fastest *expressible* form; the
residual over the twin is the engine's interpreted-HOF cost, not a
plan defect.  Re-run me if the engine gains HOF codegen.

Usage: python scripts/ab_embed_normalize.py [sf_dir] [reps]
(expect variant B to need a kill at sf1 — run it at sf0.1 first)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframe_pipeline_spark import similarity as sim
from dataframe_pipeline_spark.session import get_spark

DIM, SCALE = 64, 1000


def q_a(df):
    out = sim.VectorNormalizer().transform(df)
    return out.select("vec_id", F.posexplode("vec_norm").alias("dim", "val"))


def _qi(i):
    return F.round(F.col("embedding").getItem(i).cast("double") * SCALE,
                   0).cast("bigint")


def q_b(df):
    nrm = F.sqrt(sum((_qi(i) * _qi(i) for i in range(1, DIM)),
                     _qi(0) * _qi(0)).cast("double"))
    d2 = df.withColumn("__nrm", nrm)
    vals = F.array(*[F.round(_qi(i) / F.col("__nrm"), 6)
                     for i in range(DIM)])
    return (d2.withColumn("vec_norm", vals)
            .select("vec_id", F.posexplode("vec_norm").alias("dim", "val")))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-embed-normalize")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()

    small = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = sorted(map(tuple, q_a(small).collect()))
    b = sorted(map(tuple, q_b(small).collect()))
    print("equality:", "OK" if a == b else f"MISMATCH {len(a)} vs {len(b)}")

    times = {"A_hof": [], "B_unrolled": []}
    for r in range(reps):
        for name, fn in (("A_hof", q_a), ("B_unrolled", q_b)):
            spark.sparkContext.setJobDescription(f"ab_embed_norm {name} r{r}")
            t0 = time.perf_counter()
            fn(emb).write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for n, ts in times.items():
        print(f"{n:12s} min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
