"""A/B: SegmentDeduplicator reassembly (guide §2.3 / §8).

Current shape (A): exploded (doc_id, pos, seg TEXT) rows ride the
left-anti join and the per-doc regroup — the final groupBy(doc_id)
shuffles every surviving segment's text.

Candidate (B): decide with small rows, never move the text.  The hash
pass shuffles (h, doc) pairs exactly as today; the positions of DROPPED
segments (usually few) are collected per doc and joined back to the
INTACT docs (AQE broadcasts when small); reassembly filters the per-row
segment array by index — map-side, zero text shuffle.

Usage: python scripts/ab_dedup_segments.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataframe_pipeline_spark import dedup as dd
from dataframe_pipeline_spark.dedup import h60_expr, spread
from dataframe_pipeline_spark.session import get_spark


def transform_b(df: DataFrame, k: int = 8, max_doc_freq: int = 1,
                id_col: str = "doc_id", text_col: str = "text"):
    toks = f"split({text_col}, ' ')"
    nseg = f"cast(ceil(size({toks}) / {k}.0) as int)"
    segs = (f"transform(sequence(0, {nseg} - 1), "
            f"i -> concat_ws(' ', slice({toks}, i*{k}+1, {k})))")
    base = spread(df)
    seg_h = (base.select(F.col(id_col),
                         F.posexplode(F.expr(segs)).alias("pos", "seg"))
             .select(id_col, "pos", F.expr(h60_expr("seg")).alias("__h")))
    common = (seg_h.groupBy("__h")
              .agg(F.count_distinct(id_col).alias("__df"))
              .filter(F.col("__df") > max_doc_freq)
              .select("__h"))
    dropped = (seg_h.join(common, "__h", "left_semi")
               .groupBy(id_col)
               .agg(F.collect_set("pos").alias("__dropped")))
    out = (base.join(dropped, id_col, "left")
           .withColumn("__dropped", F.coalesce(
               F.col("__dropped"), F.expr("array()")))
           .select(F.col(id_col),
                   F.expr(f"array_join(filter({segs}, (s, i) -> "
                          f"NOT array_contains(__dropped, i)), ' ')")
                   .alias("cleaned"),
                   (F.expr(nseg) - F.size("__dropped"))
                   .cast("long").alias("n_segments"))
           .filter(F.col("n_segments") > 0))
    return out


def q_a(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dd.SegmentDeduplicator(k=8, max_doc_freq=1).transform(docs)


def q_b(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return transform_b(docs, k=8, max_doc_freq=1)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab-dedup-segments")

    small = "/root/testdata/sf0.01"
    a = sorted(map(tuple, q_a(spark, small).collect()))
    b = sorted(map(tuple, q_b(spark, small).collect()))
    assert a == b, f"MISMATCH rows a={len(a)} b={len(b)} first_diff={next(((x,y) for x,y in zip(a,b) if x!=y), None)}"
    print(f"equality OK at sf0.01: {len(a)} rows identical")

    times = {"A_regroup_text": [], "B_positions_only": []}
    for r in range(reps):
        for name, fn in (("A_regroup_text", q_a),
                         ("B_positions_only", q_b)):
            spark.sparkContext.setJobDescription(f"ab_dedup_segments {name} r{r}")
            df = fn(spark, sf_dir)
            t0 = time.time()
            noop(df)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
