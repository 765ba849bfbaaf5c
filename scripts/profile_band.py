"""Floor profile for the above-floor sf1 events/text band (VERDICT r11
#2/#7) — the rows with REAL DuckDB oracle work (0.3–1.2 s) that the
lineitem scan-floor argument does not cover.

Same discipline as scripts/profile_weak.py: for each row, time the FULL
registered query against a scan-width-honest TWIN — the same parquet
scan width and the same shuffle/explode shape, minus exactly the one
semantic cost being named — interleaved in one session, min of N.  If
full ≈ twin, the row's residual is engine floor for that shape; the gap
full − twin is the named semantic cost:

  events_latest       twin: scalar max per column     names: argmax struct ordering
  events_json_props   twin: length(props)             names: JSON parse
  events_hourly_agg   twin: double sum                names: exact decimal sum
  session_stats       twin: tumbling-window hash agg  names: gap-session merge sort
  event_transitions   twin: hash agg, same columns    names: per-user lag sort
  embed_normalize     twin: raw posexplode            names: norm arithmetic
  text_normalize      twin: lower(text) only          names: regex passes
  text_pack           twin: chunk explode only        names: packer window cumsum
  text_bm25_topk      twin: split + dl topk           names: tf arrays + stats pass
  quantile_bin        twin: literal when-chain        names: percentile fit job
  resample_user_daily twin: sparse day hash agg       names: spine explode + left join
  merge_latest        twin: union + first() hash agg  names: winner-row window
  dedup_incremental   twin: both scans, length agg    names: sha2 digests + anti joins
  dedup_segments      twin: segment explode + agg     names: common-seg detect + reassembly
  graph_pagerank      twin: 1 iteration (of 3)        names: iteration count
  events_click_attr.  twin: equi-join, no interval    names: time-range predicate

plus per-table scan floors (floor_scan_only/{events,documents,
embeddings,orders}) so duck-time-under-half-floor rows have committed
exemption arithmetic on THEIR table, not lineitem's (VERDICT r11 #7).

Usage: python scripts/profile_band.py [sf_dir] [reps]
Env:   PROFILE_BAND_OUT=path.json to write the artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark import text as tx  # noqa: E402
from dataframe_pipeline_spark.ext_queries import (  # noqa: E402
    EXT_QUERIES, _events)
from dataframe_pipeline_spark.queries import _t  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402


def _q(name):
    return EXT_QUERIES[name][0]


# -- twins (scan-width-honest: read the SAME columns) ----------------------

def twin_events_latest(spark, sf_dir):
    """Same groups, same columns, three codegen scalar maxes instead of
    one interpreted struct-ordering max — isolates the argmax cost."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("user_id", "event_type")
            .agg(F.max("ts").alias("_t"), F.max("event_id").alias("_e"),
                 F.max("value").alias("_v")))


def twin_events_json_props(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select("event_id", F.length("props").alias("k_val"))


def twin_events_hourly(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("_s")))


def twin_session_stats(spark, sf_dir):
    """Tumbling-window hash aggregate over the same (user_id, ts,
    value) scan — no gap-session merge, no decimal."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("_s")))


def twin_event_transitions(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (ev.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("ts").alias("_t"), F.max("event_id").alias("_e")))


def twin_embed_normalize(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.posexplode("embedding").alias("dim", "val"))


def twin_text_normalize(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.lower("text").alias("norm"))


def twin_text_pack(spark, sf_dir):
    """The chunk explode alone (identical first stage of text_pack) —
    the gap is the shard-window cumulative sum + pack-id arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    return tx.DocumentChunker(max_tokens=48, overlap=8).transform(docs)


def twin_text_bm25(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl"))
    return toks.orderBy(F.desc("dl"), F.asc("doc_id")).limit(20)


def twin_quantile_bin(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    c = F.col("o_totalprice")
    bins = ((c > 50_000).cast("int") + (c > 100_000).cast("int")
            + (c > 200_000).cast("int"))
    return od.select("o_orderkey", bins.cast("int").alias("price_bin"))


def twin_resample(spark, sf_dir):
    ev = _events(spark, sf_dir)
    day = F.to_timestamp(F.from_unixtime(
        F.floor(F.unix_timestamp("ts") / 86400) * 86400))
    return (ev.groupBy("user_id", day.alias("bucket"))
            .agg(F.count("event_id").alias("n_events"),
                 F.sum("value").alias("_v")))


def twin_merge_latest(spark, sf_dir):
    """Union + one hash aggregate carrying every orders column through
    first()/max() — same scan width and shuffle volume as the winner
    window, no per-group sort."""
    od = _t(spark, sf_dir, "orders")
    base = od.withColumn("__v", F.lit(0))
    updates = (od.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") * 2)
               .withColumn("__v", F.lit(1)))
    u = base.unionByName(updates)
    aggs = [F.max("__v").alias("__v")] + \
        [F.first(c).alias(c) for c in od.columns if c != "o_orderkey"]
    return u.groupBy("o_orderkey").agg(*aggs)


def twin_dedup_incremental(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    snap_sources = [f"src{i}" for i in range(10)]
    snapshot = docs.filter(F.col("source").isin(snap_sources))
    batch = docs.filter(~F.col("source").isin(snap_sources))
    both = (snapshot.select(F.length("text").alias("l"))
            .unionByName(batch.select(F.length("text").alias("l"))))
    return both.groupBy("l").agg(F.count(F.lit(1)).alias("n"))


def twin_dedup_segments(spark, sf_dir):
    """The segment explode + one hash aggregate — the gap is the
    common-segment detection (second aggregate + distinct-doc count)
    and the position-ordered reassembly."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    segs = toks.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0),
                       F.ceil(F.size("toks") / 8).cast("int") - 1),
            lambda i: F.array_join(
                F.slice("toks", i * 8 + 1, 8), " "))).alias("pos", "seg"))
    return (segs.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segments"),
                 F.sum(F.length("seg")).alias("_l")))


def twin_click_attribution(spark, sf_dir):
    """Same two filtered event scans + the same user_id equi-join +
    grouped count, WITHOUT the 30-minute interval condition — the gap
    is the time-range predicate evaluation on the joined pairs (the
    interval join's semantic cost)."""
    ev = _events(spark, sf_dir)
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts")))
    return (p.join(c, p.user_id == c.cu)
            .groupBy("purchase_id", "user_id")
            .agg(F.count(F.lit(1)).alias("n_clicks_30m")))


def twin_pagerank(spark, sf_dir):
    from dataframe_pipeline_spark.ext_queries import q_graph_pagerank  # noqa
    from dataframe_pipeline_spark.graph import build_adjacency, pagerank
    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(F.col("l_orderkey").alias("src"),
                      (F.col("l_partkey") + 100_000_000).alias("dst"))
    adj = build_adjacency(edges)
    pr = pagerank(adj=adj, iters=1)
    return (pr.select("id", F.round("pr", 6).alias("pr"))
            .orderBy(F.desc("pr"), F.asc("id")).limit(20))


# -- per-table scan floors (read EVERY column, trivial agg) ----------------

def floor_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("_t"),
                 F.max("event_id").alias("_e"), F.max("user_id").alias("_u"),
                 F.sum("value").alias("_v"),
                 F.sum(F.length("props")).alias("_p")))


def floor_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, t in docs.dtypes:
        aggs.append((F.sum(F.length(c)) if t == "string"
                     else F.max(c)).alias(f"_{c}"))
    return docs.groupBy("source").agg(*aggs)


def floor_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(F.size("embedding")).alias("_d")]
    for c, t in emb.dtypes:
        if t in ("bigint", "int", "double", "string"):
            aggs.append(F.max(c).alias(f"_{c}"))
    return emb.groupBy().agg(*aggs)


def floor_orders(spark, sf_dir):
    od = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, t in od.dtypes:
        aggs.append((F.sum(F.length(c)) if t == "string"
                     else F.max(c)).alias(f"_{c}"))
    return od.groupBy("o_orderpriority").agg(*aggs)


CASES = {
    "events_latest": (_q("events_latest"), twin_events_latest),
    "events_json_props": (_q("events_json_props"), twin_events_json_props),
    "events_hourly_agg": (_q("events_hourly_agg"), twin_events_hourly),
    "session_stats": (_q("session_stats"), twin_session_stats),
    "event_transitions": (_q("event_transitions"), twin_event_transitions),
    "embed_normalize": (_q("embed_normalize"), twin_embed_normalize),
    "text_normalize": (_q("text_normalize"), twin_text_normalize),
    "text_pack": (_q("text_pack"), twin_text_pack),
    "text_bm25_topk": (_q("text_bm25_topk"), twin_text_bm25),
    "quantile_bin": (_q("quantile_bin"), twin_quantile_bin),
    "resample_user_daily": (_q("resample_user_daily"), twin_resample),
    "merge_latest": (_q("merge_latest"), twin_merge_latest),
    "dedup_incremental": (_q("dedup_incremental"), twin_dedup_incremental),
    "dedup_segments": (_q("dedup_segments"), twin_dedup_segments),
    "graph_pagerank": (_q("graph_pagerank"), twin_pagerank),
    "events_click_attribution": (_q("events_click_attribution"),
                                 twin_click_attribution),
}

FLOORS = {
    "floor_scan_only/events": floor_events,
    "floor_scan_only/documents": floor_documents,
    "floor_scan_only/embeddings": floor_embeddings,
    "floor_scan_only/orders": floor_orders,
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-band")
    # warm scans + arrow workers outside the timed loops
    for t in ("events", "documents", "embeddings", "orders", "lineitem"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")

    best: dict[str, float] = {}
    canary = None
    for _rep in range(reps):
        t0 = time.perf_counter()
        con.execute(CANARY_SQL).fetchall()
        canary = min(canary or 1e9, time.perf_counter() - t0)
        for name, (full, twin) in CASES.items():
            for tag, fn in (("full", full), ("twin", twin)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                key = f"{name}/{tag}"
                best[key] = min(best.get(key, 1e9),
                                time.perf_counter() - t0)
        for name, fn in FLOORS.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = min(best.get(name, 1e9),
                             time.perf_counter() - t0)

    print(f"duckdb_canary(rollup oracle): {canary:.3f}s")
    for name in FLOORS:
        print(f"{name:34s} {best[name]:7.3f}s")
    for name in CASES:
        f, n = best[f"{name}/full"], best[f"{name}/twin"]
        print(f"{name:34s} full={f:7.3f}s twin={n:7.3f}s "
              f"residual={f - n:+.3f}s")
    out = os.environ.get("PROFILE_BAND_OUT")
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
