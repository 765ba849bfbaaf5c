"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the `noop` sink so every output column
is actually computed (a bare count() would let Catalyst prune the work).

Load-noise hygiene (BENCH_r02 read 2x BENCH_r01 purely from a busy
machine; r4/r6/r7 were contaminated MID-loop): each query reports min
of 3 runs ("queries") AND the median ("queries_median"); a fixed-work
canary — ``spark.range(2e8).sum()`` — gates the start of the run AND is
probed AFTER EVERY TIER ("tier_canaries"): a dirty post-tier probe
triggers an idle-wait and a full re-time of that tier with per-query
min-merge, so contention arriving mid-run can no longer poison the
committed artifact (VERDICT r7 #1).

"online_p50_ms" tracks the reference's second deploy shape (1-row
online scoring, /root/reference/benchmarks/RunBench.py:69-77): median
wall-clock to run a fitted pipeline's transform plan over a single-row
frame, driver round-trip included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pipeline_flagship",
    "agg_group_mean",
    "agg_group_std",
    "freq_count",
    "label_encode",
    "onehot",
    "date_features",
    "minority",
    "scaler_standard",
    "strconcat",
    "function_native",
    "row_filter",
]

#: Round-4 tier, timed and reported under "queries_r4" but NOT summed
#: into "value"/"median_total" — those stay comparable across rounds.
R4_EXTRAS = [
    "join_salted",
    "pivot_event_counts",
    "clip_outliers",
    "merge_latest",
    "profile_customer",
    "target_encode_cv",
    "dedup_embedding_auto",
    "graph_pagerank",
    "range_join_bands",
    "record_linkage",
    "dedup_minhash_incremental",
    "events_trending",
]

#: Extended TPC-H tier (new this round), timed under "queries_tpch" and
#: NOT summed into "value"/"median_total" — those stay comparable.
TPCH_EXTRAS = [
    "tpch_q4_priority", "tpch_q6_revenue", "tpch_q7_volume",
    "tpch_q8_share", "tpch_q9_profit", "tpch_q10_returns",
    "tpch_q13_custdist", "tpch_q14_promo", "tpch_q15_top_supplier",
    "tpch_q17_small_qty", "tpch_q18_large_orders", "tpch_q19_disjunct",
    "tpch_q21_waiting", "tpch_q22_idle", "expect_orders",
]

#: Round-5 tier: sketch twins of the exact-percentile shapes, the new
#: warehouse ops, and the real-codec multimodal pipeline — timed under
#: "queries_r5", NOT summed into "value"/"median_total".
R5_EXTRAS = [
    "clip_outliers_approx",
    "scaler_robust_approx",
    "expect_orders_hll",
    "agg_group_median_approx",
    "agg_group_nunique_approx",
    "scd2_user_state",
    "rollup_incremental",
    "resample_user_daily",
    "multimodal_gif_roundtrip",
    "woe_encode",
    "text_clf_score",
]

#: Round-6 tier: the adapted TPC-H completions (Q2/Q11/Q12/Q16/Q20),
#: the training-corpus layout ops (temperature mixing, shard
#: assignment, Z-order key), timed under "queries_r6", NOT summed into
#: "value"/"median_total".
R6_EXTRAS = [
    "tpch_q2_mincost",
    "tpch_q11_value",
    "tpch_q12_priority_class",
    "tpch_q16_variety",
    "tpch_q20_excess",
    "mix_temperature",
    "shard_stats",
    "shard_layout",
    "zorder_key_orders",
    "corpus_curation",
    "sim_ann_pq",
    "sim_ann_pq_rerank",
    "dedup_semantic",
    "cluster_embeddings",
    "sim_ann_ivfpq",
    "dedup_substring",
    "dedup_substring_trim",
    "text_bm25_topk",
    "cms_user_counts",
    "join_bloom_prune",
    "sim_ann_ivf_append",
    "text_unigram_tokens",
]

#: Round-7 tier: persisted-PQ retrieval (search-without-refit as the
#: measured deployment shape) and cross-corpus semantic
#: decontamination — timed under "queries_r7", NOT summed.
R7_EXTRAS = [
    "sim_ann_pq_persisted",
    "decontaminate_semantic",
    "curriculum_buckets",
    "sample_fixed_k",
]

#: Round-8 tier: persisted IVF-PQ retrieval — timed under
#: "queries_r8", NOT summed.
R8_EXTRAS = [
    "sim_ann_ivfpq_persisted",
]

#: Round-10/11 tier: the AnnAnnotator pipeline stage, its streaming
#: batch twin, and the statistics-gated salting row — timed under
#: "queries_r11", NOT summed.
R11_EXTRAS = [
    "sim_ann_annotate",
    "events_ann_annotate",
    "join_salted_auto",
]

#: r10's machine-canary readings at sf0.1 (BENCH_r10.json), the anchor
#: for cross-round normalization (VERDICT r10 #4).  Valid ONLY for the
#: sf0.1 run the driver executes — the DuckDB probe scans the round's
#: lineitem, so its wall scales with sf.
R10_CANARY_ANCHOR = {"duckdb_lineitem_agg_s": 0.0448,
                     "numpy_sort20m_s": 0.4803}

EXT_HEADLINE = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_token_count",
    "text_quality",
    "sim_topk_cosine",
    "events_hourly_agg",
    "sessionize",
    "asof_last_purchase",
    "events_rolling_30m",
    "tpch_pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
]


def _canary(spark) -> float:
    """Fixed CPU-bound probe: ~0.2 s on an idle local[32] box; a 2x+
    reading means the measurement environment is contaminated."""
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id)").collect()
    return round(time.perf_counter() - t0, 3)


#: Canary reading above which the machine is considered contaminated
#: (idle local[32] measures ~0.20 s; the two contaminated committed
#: benches, r4 and r6, read 0.33-0.40 s).
CANARY_GATE_SEC = 0.30


def _machine_canary(sf_dir: str) -> dict:
    """Machine-speed normalizer (VERDICT r9 #4): fixed, Spark-free
    probes so cross-round Spark numbers can be normalized for VM speed
    (r9's 10.06s headline vs r8's 9.01s read as a regression until
    DuckDB's own 738->770s total exposed the slower VM).

    Two probes, min of 3 each: a DuckDB single-thread-ish aggregate
    over the round's lineitem (same SQL + data every round at a given
    sf) and a numpy sort+sum of a fixed seeded array (data-independent
    pure-CPU).  Normalization rule (SCALE.md): before comparing Spark
    walls across rounds, divide by (this round's duckdb probe / the
    reference round's); >10% probe drift = environment, not code."""
    import duckdb
    import numpy as np

    out = {}
    con = duckdb.connect()
    sql = (f"SELECT l_returnflag, l_linestatus, "
           f"sum(l_extendedprice * (1 - l_discount)), count(*) "
           f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2")
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["duckdb_lineitem_agg_s"] = round(best, 4)
    a = np.random.default_rng(0).random(20_000_000)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.sort(a).sum())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out["numpy_sort20m_s"] = round(best, 4)
    return out


def _wait_for_idle(spark, max_tries: int = 6,
                   sleep_s: float = 20.0) -> list[float]:
    """Don't START measuring on a contended machine: two of six
    committed benches (r4, r6) were contaminated runs — every unchanged
    query uniformly 15-45% slower with a dirty canary — which the
    driver then records as a regression.  Probe the canary; while it
    exceeds CANARY_GATE_SEC, sleep and re-probe (bounded).  Returns the
    probe history so the artifact shows the gate's evidence."""
    history = []
    for i in range(max_tries):
        c = _canary(spark)
        history.append(c)
        if c <= CANARY_GATE_SEC:
            break
        if i < max_tries - 1:
            print(f"canary {c}s > {CANARY_GATE_SEC}s gate; "
                  f"sleeping {sleep_s}s before retry", file=sys.stderr)
            time.sleep(sleep_s)
    return history


def _time_tier(spark, qs, names, sf_dir, n_runs: int = 3):
    """min + median of n_runs per query (min = steady state, median =
    the load-noise tell); each run clears the cache first so it pays
    its own full cost and leaves nothing behind for neighbors."""
    mins, meds = {}, {}
    for name in names:
        if name not in qs:
            continue
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        mins[name] = round(runs[0], 3)
        meds[name] = round(runs[len(runs) // 2], 3)
    return mins, meds


def _guarded_tier(spark, qs, names, sf_dir, tier: str,
                  gate_history: list, tier_canaries: dict):
    """Time one tier, then PROBE THE CANARY: three committed benches
    (r4, r6, r7) were contaminated by load arriving MID-LOOP, which
    endpoint-only canaries cannot see (VERDICT r7 #1).  A dirty
    post-tier probe means this tier's numbers are suspect: wait the
    machine back to idle and re-time the whole tier, keeping the
    min-merge (per query, the faster coherent run).  Per-tier probe
    history lands in the artifact so a contaminated window is
    self-identifying in review."""
    mins, meds = _time_tier(spark, qs, names, sf_dir)
    probes = [_canary(spark)]
    if probes[0] > CANARY_GATE_SEC:
        gate_history += _wait_for_idle(spark)
        re_min, re_med = _time_tier(spark, qs, names, sf_dir)
        for n, v in re_min.items():
            if v < mins.get(n, float("inf")):
                mins[n], meds[n] = v, re_med[n]
        probes.append(_canary(spark))
    tier_canaries[tier] = probes
    return mins, meds


def _online_p50_ms(spark, n_iter: int = 15) -> dict:
    """Serving-path latencies with the same min+median discipline as the
    batch queries (median = the comparable per-round trend number, min =
    the load-noise floor).

    Paths: "exec_only" re-collects the COMPILED serving plan (serving.py:
    lookup joins inlined as literal maps, input as an inline-VALUES
    LocalRelation — the plan folds to LocalTableScan, collect() is
    job-free); "serve_request" is the full per-request path (render row
    → analyze → collect, i.e. plan_and_exec on the serving tier);
    "exec_only_join_plan" / "plan_and_exec_join_plan" keep the r3/r4
    batch-plan numbers comparable (join plan over a Python-RDD input —
    pays a full Spark job per request); "ann_search_vec" is the
    external-query-vector probe served from the in-process replica
    (IVFIndex.serving_replica — the vector twin of the literal-map
    fold, r8), with the old batch-plan probe kept comparable as
    "ann_search_vec_plan"."""
    import statistics

    import dataframe_pipeline_spark as dfp
    from dataframe_pipeline_spark.ext_queries import _events
    from dataframe_pipeline_spark.serving import local_rows_df, serve_rows
    from dataframe_pipeline_spark.similarity import IVFIndex

    ev = _events(spark, "/root/testdata/sf0.001")
    pipe = dfp.DataframePipeline(steps=[
        dfp.ComplementLabelEncoder(inputs=["event_type"], outputs=["type_id"]),
        dfp.Aggregator(inputs=["value"], outputs=["user_mean"],
                       groupby=["user_id"], func="mean"),
        dfp.Scaler(inputs=["value"], outputs=["value_mm"], strategy="minmax"),
    ])
    pipe.fit(ev)
    head = ev.head()
    one = spark.createDataFrame([head], schema=ev.schema)
    join_plan = pipe.transform(one)
    join_plan.collect()                    # warm the batch-plan path
    serving_plan = pipe.serving_transform(
        local_rows_df(spark, [head], ev.schema))
    serving_plan.collect()                 # warm + build literal maps

    # WOE-containing pipeline: proves the r6 _serve_woe_encoder keeps
    # the job-free literal-map path (pre-r6 this silently fell back to
    # the ~250 ms join plan).
    from pyspark.sql import functions as F
    ev_y = ev.withColumn("y", (F.col("value") > 0).cast("int"))
    woe_pipe = dfp.DataframePipeline(steps=[
        dfp.WOEEncoder(inputs=["event_type"], outputs=["type_woe"],
                       target="y")])
    woe_pipe.fit(ev_y)
    head_y = ev_y.head()
    serve_rows(woe_pipe, spark, [head_y], ev_y.schema)  # warm + cache

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IVFIndex(k=5, n_lists=8, n_probe=2).fit(emb)
    qvec = list(emb.head()["embedding"])
    idx.search_vec(qvec).collect()         # warm the batch probe path
    replica = idx.serving_replica()        # fold cells into the replica
    assert replica.search_vec(qvec) == [
        (r["vec_id"], r["cosine"])
        for r in idx.search_vec(qvec).collect()]   # parity at bench time
    from dataframe_pipeline_spark.similarity import PQIndex
    pq_rep = PQIndex(k=5, m=8, k_sub=16).fit(emb).serving_replica()

    # r9: replica-backed SMALL-BATCH ANN (search_batch_local) vs the
    # distributed batch join over the same 100-query table — the
    # crossover pair behind the LOCAL_BATCH_MAX_ROWS gate.  The query
    # table is a LocalRelation (rows arrive driver-side in a backfill
    # request), so the local path runs no Spark job at all.
    q_rows = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
              for r in emb.limit(100).collect()]
    q100 = spark.createDataFrame(q_rows, "qid long, embedding array<double>")
    local_out = sorted(idx.search_batch_local(q_rows))
    dist_out = sorted(map(tuple, idx.search_batch(
        q100, q_id_col="qid").collect()))
    assert local_out == dist_out          # parity at bench time

    # r10: a PIPELINE with an ANN stage on the compiled serving path
    # (AnnAnnotator -> _serve_ann_annotator replica probes; VERDICT r9
    # #7) vs the same pipeline's distributed batch transform on one row.
    from dataframe_pipeline_spark.serving import local_rows_df as _lrd
    from dataframe_pipeline_spark.similarity import AnnAnnotator
    ann_pipe = dfp.DataframePipeline(steps=[
        AnnAnnotator(k=5, n_lists=8, n_probe=2)])
    ann_pipe.fit(emb)
    emb_head = [emb.head()]
    ann_pipe.serving_transform(
        _lrd(spark, emb_head, emb.schema)).collect()   # warm + replica
    ann_pipe.transform(
        spark.createDataFrame(emb_head, schema=emb.schema)).collect()  # warm

    full, exec_join, exec_serv, req_serv, req_woe = [], [], [], [], []
    ann, ann_plan, ann_pq, ann_b_local, ann_b_plan = [], [], [], [], []
    ann_pipe_serve, ann_pipe_plan = [], []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        pipe.transform(one).collect()
        full.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        join_plan.collect()
        exec_join.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        serving_plan.collect()
        exec_serv.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        serve_rows(pipe, spark, [head], ev.schema)
        req_serv.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        serve_rows(woe_pipe, spark, [head_y], ev_y.schema)
        req_woe.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        replica.search_vec(qvec)
        ann.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        pq_rep.search_vec(qvec)
        ann_pq.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idx.search_vec(qvec).collect()
        ann_plan.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idx.search_batch_local(q_rows)
        ann_b_local.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idx.search_batch(q100, q_id_col="qid").collect()
        ann_b_plan.append(time.perf_counter() - t0)
        # both sides REQUEST-shaped: the row arrives driver-side and
        # each path builds its plan fresh (serving renders + folds a
        # LocalRelation; batch wraps a Python-RDD input and runs jobs)
        t0 = time.perf_counter()
        ann_pipe.serving_transform(
            _lrd(spark, emb_head, emb.schema)).collect()
        ann_pipe_serve.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        ann_pipe.transform(
            spark.createDataFrame(emb_head, schema=emb.schema)).collect()
        ann_pipe_plan.append(time.perf_counter() - t0)

    def ms(x):
        return round(x * 1000, 1)

    return {
        # the serving tier (r5): compiled literal-map plan, LocalRelation
        "exec_only": ms(statistics.median(exec_serv)),
        "exec_only_min": ms(min(exec_serv)),
        "serve_request": ms(statistics.median(req_serv)),
        "serve_request_min": ms(min(req_serv)),
        # WOE-containing pipeline on the compiled serving path (r6)
        "serve_request_woe": ms(statistics.median(req_woe)),
        "serve_request_woe_min": ms(min(req_woe)),
        # r3/r4-comparable join-plan keys (same meaning as before)
        "plan_and_exec_join_plan": ms(statistics.median(full)),
        "plan_and_exec_join_plan_min": ms(min(full)),
        "exec_only_join_plan": ms(statistics.median(exec_join)),
        "exec_only_join_plan_min": ms(min(exec_join)),
        "ann_search_vec": ms(statistics.median(ann)),
        "ann_search_vec_min": ms(min(ann)),
        # r3-r7-comparable batch-plan probe (full Spark job per request)
        "ann_search_vec_plan": ms(statistics.median(ann_plan)),
        "ann_search_vec_plan_min": ms(min(ann_plan)),
        # compressed (PQ codes) replica probe — the 100 TB serving shape
        "ann_pq_serving": ms(statistics.median(ann_pq)),
        "ann_pq_serving_min": ms(min(ann_pq)),
        # r9: 100-query backfill — replica-backed local batch vs the
        # distributed batch join (the LOCAL_BATCH_MAX_ROWS crossover)
        "ann_batch100_local": ms(statistics.median(ann_b_local)),
        "ann_batch100_local_min": ms(min(ann_b_local)),
        "ann_batch100_plan": ms(statistics.median(ann_b_plan)),
        "ann_batch100_plan_min": ms(min(ann_b_plan)),
        # r10: a pipeline WITH an ANN stage, end-to-end on the compiled
        # serving path (replica probes, zero jobs) vs its distributed
        # batch transform on the same single row
        "ann_pipeline_serve": ms(statistics.median(ann_pipe_serve)),
        "ann_pipeline_serve_min": ms(min(ann_pipe_serve)),
        "ann_pipeline_plan": ms(statistics.median(ann_pipe_plan)),
        "ann_pipeline_plan_min": ms(min(ann_pipe_plan)),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE + EXT_HEADLINE if n in qs]

    # Warm the JVM/session (codegen, shuffle, broadcast, window paths) with
    # a full pipeline run at the smallest SF so the first measured query
    # doesn't pay one-time startup cost.  r12 (VERDICT r11 #6): the round
    # VM boots cold — page-cache EVERY table at the bench sf (not just
    # lineitem) and run one untimed representative of each heavy plan
    # family (decimal agg, window, fact join) at the bench sf so first-
    # query JIT lands outside the timed section; the measured noise band
    # between the two machine canaries shrinks accordingly.
    import glob as _glob
    for p in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        try:
            spark.read.parquet(p).count()
        except Exception:
            pass
    try:
        qs["pipeline_flagship"](spark, "/root/testdata/sf0.001").write \
            .format("noop").mode("overwrite").save()
    except Exception:
        pass
    for warm_q in ("tpch_pricing_summary", "events_rolling_30m",
                   "revenue_by_nation"):
        try:
            qs[warm_q](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass
    # Warm the Arrow PYTHON workers (spawn + numpy/pandas import on
    # every core) so the first codec/stateful-twin query isn't charged
    # ~10s of one-time worker startup (see bench_vs_duckdb.py, r9).
    def _noop_batches(batches):
        yield from batches
    (spark.range(0, 1024, 1, 32)
     .mapInPandas(_noop_batches, schema="id long").count())

    gate_history = _wait_for_idle(spark)
    canary_before = gate_history[-1]
    machine_canary = _machine_canary(sf_dir)

    tier_canaries: dict = {}
    times, medians = _guarded_tier(
        spark, qs, names, sf_dir, "headline", gate_history, tier_canaries)
    extras, extras_median = _guarded_tier(
        spark, qs, R4_EXTRAS, sf_dir, "r4", gate_history, tier_canaries)
    tpch, tpch_median = _guarded_tier(
        spark, qs, TPCH_EXTRAS, sf_dir, "tpch", gate_history, tier_canaries)
    r5, r5_median = _guarded_tier(
        spark, qs, R5_EXTRAS, sf_dir, "r5", gate_history, tier_canaries)
    r6, r6_median = _guarded_tier(
        spark, qs, R6_EXTRAS, sf_dir, "r6", gate_history, tier_canaries)
    r7, r7_median = _guarded_tier(
        spark, qs, R7_EXTRAS, sf_dir, "r7", gate_history, tier_canaries)
    r8, r8_median = _guarded_tier(
        spark, qs, R8_EXTRAS, sf_dir, "r8", gate_history, tier_canaries)
    r11, r11_median = _guarded_tier(
        spark, qs, R11_EXTRAS, sf_dir, "r11", gate_history, tier_canaries)

    canary_after = tier_canaries["r11"][-1]
    try:
        online_ms = _online_p50_ms(spark)
    except Exception:
        online_ms = None

    total = round(sum(times.values()), 3)
    # Canary-normalized cross-round comparison (VERDICT r10 #4): the
    # normalization RULE from SCALE.md, applied in the artifact itself
    # so the reader never has to fetch the anchor.  Only emitted for
    # the sf0.1 run the anchor was taken at.
    canary_norm = None
    if sf.replace(".", "").isdigit() and abs(float(sf) - 0.1) < 1e-9:
        d_ratio = round(machine_canary["duckdb_lineitem_agg_s"]
                        / R10_CANARY_ANCHOR["duckdb_lineitem_agg_s"], 3)
        n_ratio = round(machine_canary["numpy_sort20m_s"]
                        / R10_CANARY_ANCHOR["numpy_sort20m_s"], 3)
        # BOTH normalizations, reported as a range (VERDICT r11 #4/#6):
        # the two canaries disagreed by 17% in r11, so a single
        # normalized number over-states precision — the honest trend
        # read is the [min, max] band.
        norms = sorted([round(total / d_ratio, 3), round(total / n_ratio, 3)])
        canary_norm = {
            "anchor_round": "r10",
            "anchor": R10_CANARY_ANCHOR,
            "duckdb_ratio": d_ratio,
            "numpy_ratio": n_ratio,
            # raw total divided by each probe ratio = what this round's
            # headline total WOULD read on r10's box; compare against
            # r10's raw 11.235 s.  Read the RANGE, not either endpoint.
            "headline_total_normalized": round(total / d_ratio, 3),
            "headline_total_normalized_numpy": round(total / n_ratio, 3),
            "headline_total_normalized_range": norms,
            "r10_headline_total_raw": 11.235,
        }
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_median": medians,
        "median_total": round(sum(medians.values()), 3),
        "queries_r4": extras,
        "queries_r4_median": extras_median,
        "r4_total": round(sum(extras.values()), 3),
        "queries_tpch": tpch,
        "queries_tpch_median": tpch_median,
        "tpch_total": round(sum(tpch.values()), 3),
        "queries_r5": r5,
        "queries_r5_median": r5_median,
        "r5_total": round(sum(r5.values()), 3),
        "queries_r6": r6,
        "queries_r6_median": r6_median,
        "r6_total": round(sum(r6.values()), 3),
        "queries_r7": r7,
        "queries_r7_median": r7_median,
        "r7_total": round(sum(r7.values()), 3),
        "queries_r8": r8,
        "queries_r8_median": r8_median,
        "r8_total": round(sum(r8.values()), 3),
        "queries_r11": r11,
        "queries_r11_median": r11_median,
        "r11_total": round(sum(r11.values()), 3),
        "canary_normalized": canary_norm,
        "canary_sec": [canary_before, canary_after],
        "canary_gate_history": gate_history,
        "machine_canary": machine_canary,
        "tier_canaries": tier_canaries,
        "online_p50_ms": online_ms,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Per-query medians etc. go to a sidecar file; the FINAL stdout line
    # stays compact so the driver's tail capture always parses it
    # (BENCH_r04.json was truncated mid-JSON when the single line outgrew
    # the tail window — VERDICT r4 "What's wrong" #1).
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json")
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,  # headline per-query mins only (~24 entries)
        "median_total": detail["median_total"],
        "r4_total": detail["r4_total"],
        "tpch_total": detail["tpch_total"],
        "r5_total": detail["r5_total"],
        "r6_total": detail["r6_total"],
        "r7_total": detail["r7_total"],
        "r8_total": detail["r8_total"],
        "r11_total": detail["r11_total"],
        "canary_normalized": canary_norm,
        "canary_sec": detail["canary_sec"],
        "machine_canary": machine_canary,
        "tier_canaries": tier_canaries,
        "online_exec_ms": (online_ms or {}).get("exec_only"),
        "detail_file": "BENCH_DETAIL.json",
        "sf": detail["sf"],
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
