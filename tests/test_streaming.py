"""Structured Streaming: batch/stream-unified transformations actually
executed as streams (file source -> memory sink, availableNow)."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark import streaming as st


@pytest.fixture(scope="module")
def events_batch(spark):
    rows = [
        (0, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
        (1, "2024-01-01 00:10:00", 1, "click", 2.0, "{}"),
        (2, "2024-01-01 01:05:00", 1, "view", 3.0, "{}"),   # >30min gap
        (3, "2024-01-01 00:02:00", 2, "click", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string")
    return df.selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                         "event_type", "value", "props")


def test_hourly_agg_batch(events_batch):
    out = {(r.hour_ts.hour, r.event_type): r
           for r in st.hourly_agg(events_batch).collect()}
    assert out[(0, "click")].n == 3
    assert out[(0, "click")].sum_value == 7.0
    assert out[(1, "view")].n == 1


def test_session_stats_batch(events_batch):
    out = st.session_stats(events_batch).orderBy("user_id", "session_start")
    rows = out.collect()
    # user 1: events 0,1 merge (10min gap); event 2 is a new session
    u1 = [r for r in rows if r.user_id == 1]
    assert [r.n_events for r in u1] == [2, 1]
    assert u1[0].session_value == 3.0
    u2 = [r for r in rows if r.user_id == 2]
    assert [r.n_events for r in u2] == [1]


def test_hourly_agg_stream_equals_batch(spark, events_batch, tmp_path):
    """The same plan, executed as an actual stream, yields the batch result."""
    src = str(tmp_path / "events_stream")
    events_batch.write.parquet(src)
    sdf = (spark.readStream.schema(events_batch.schema).parquet(src))
    assert sdf.isStreaming
    st.run_to_memory(st.hourly_agg(sdf, watermark="2 hours"),
                     name="hourly_t", mode="complete")
    got = {(r.hour_ts, r.event_type): (r.n, r.sum_value)
           for r in spark.sql("SELECT * FROM hourly_t").collect()}
    exp = {(r.hour_ts, r.event_type): (r.n, r.sum_value)
           for r in st.hourly_agg(events_batch).collect()}
    assert got == exp


def test_session_stats_stream(spark, events_batch, tmp_path):
    src = str(tmp_path / "events_stream2")
    events_batch.write.parquet(src)
    sdf = spark.readStream.schema(events_batch.schema).parquet(src)
    st.run_to_memory(st.session_stats(sdf, watermark="2 hours"),
                     name="sess_t", mode="complete")
    got = spark.sql("SELECT * FROM sess_t").collect()
    assert sum(r.n_events for r in got) == 4
    # batch/stream unified: the stream's session_window result equals
    # the batch path's lag+cumsum result row-for-row (r13 split)
    exp = st.session_stats(events_batch).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_session_stats_batch_plan_is_window_hash_agg(events_batch):
    """r13: the batch path must run lag+cumsum over ONE user sort and a
    hash aggregate — not session_window's sort-based session merge
    (sf1 A/B: 2.11 -> 0.77 s)."""
    p = (st.session_stats(events_batch)
         ._jdf.queryExecution().executedPlan().toString())
    assert "session_window" not in p
    assert "Window" in p
    assert "HashAggregate" in p


def test_user_totals_stateful_stream(spark, events_batch, tmp_path):
    """applyInPandasWithState totals equal the batch groupBy twin."""
    src = str(tmp_path / "events_stream3")
    events_batch.write.parquet(src)
    sdf = spark.readStream.schema(events_batch.schema).parquet(src)
    st.run_to_memory(st.user_totals(sdf), name="totals_t", mode="update")
    # last emitted snapshot per user
    got = {r.user_id: (r.n_events, r.total_value)
           for r in spark.sql("SELECT * FROM totals_t").collect()}
    exp = {r.user_id: (r.n, r.total)
           for r in events_batch.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
           .collect()}
    assert got == exp


def test_dedup_stream(spark, events_batch, tmp_path):
    """Streaming dedup drops the duplicated event ids."""
    dup = events_batch.union(events_batch.limit(2))   # ids 0,1 duplicated
    src = str(tmp_path / "events_dup")
    dup.write.parquet(src)
    sdf = spark.readStream.schema(dup.schema).parquet(src)
    st.run_to_memory(st.dedup_stream(sdf, keys="event_id"),
                     name="dedup_t", mode="append")
    got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d FROM dedup_t").head()
    assert (got.n, got.d) == (4, 4)


def test_ingest_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming content dedup (dropDuplicatesWithinWatermark on the
    256-bit digest) keeps exactly one row per distinct text and its
    final digest set equals the batch path's — the streaming twin of
    the incremental ingest dedup."""
    import pandas as pd

    rows = pd.DataFrame({
        "doc_id": list(range(8)),
        "ts": pd.to_datetime([f"2024-01-01 00:0{i}:00" for i in range(8)]),
        # 3 distinct texts, duplicated across arrivals
        "text": ["alpha", "beta", "alpha", "gamma",
                 "beta", "alpha", "gamma", "beta"],
    })
    batch = spark.createDataFrame(rows)
    src = str(tmp_path / "docs_stream")
    batch.write.parquet(src)
    sdf = spark.readStream.schema(
        "doc_id bigint, ts timestamp, text string").parquet(src)
    st.run_to_memory(st.ingest_dedup_stream(sdf, watermark="10 minutes"),
                     name="ingest_dedup_t", mode="append")
    got = sorted(r["__digest"] for r in
                 spark.sql("SELECT __digest FROM ingest_dedup_t").collect())
    want = sorted(r["__digest"] for r in
                  st.ingest_dedup_stream(batch).select("__digest").collect())
    assert got == want and len(got) == 3


def test_score_stream_matches_batch(spark, events_batch, tmp_path):
    """A fitted pipeline scores a stream identically to the batch path."""
    import dataframe_pipeline_spark as dfp

    pipe = dfp.DataframePipeline(steps=[
        dfp.ComplementLabelEncoder(inputs=["event_type"], outputs=["type_id"]),
        dfp.Aggregator(inputs=["value"], outputs=["user_mean"],
                       groupby=["user_id"], func="mean"),
        dfp.FunctionTransformer(inputs=["value"], outputs=["v2"],
                                func=lambda v: v * 2),
    ])
    pipe.fit(events_batch)

    src = str(tmp_path / "events_score")
    events_batch.write.parquet(src)
    sdf = spark.readStream.schema(events_batch.schema).parquet(src)
    st.run_to_memory(st.score_stream(pipe, sdf), name="scored_t", mode="append")

    got = {r.event_id: (r.type_id, r.user_mean, r.v2)
           for r in spark.sql("SELECT * FROM scored_t").collect()}
    exp = {r.event_id: (r.type_id, r.user_mean, r.v2)
           for r in pipe.transform(events_batch).collect()}
    assert got == exp


def test_streamed_pipeline_end_to_end_sf001(spark, tmp_path):
    """Composed streaming path at sf0.01 real data: fit a pipeline on
    the batch events table, then stream a duplicated copy of the table
    through exact-dedup-within-watermark -> the fitted scoring
    transform -> memory sink, and assert the drained result equals the
    batch twin (dropDuplicates -> transform) exactly."""
    import dataframe_pipeline_spark as dfp
    from dataframe_pipeline_spark.ext_queries import _events

    events = _events(spark, "/root/testdata/sf0.01")
    pipe = dfp.DataframePipeline(steps=[
        dfp.ComplementLabelEncoder(inputs=["event_type"], outputs=["type_id"]),
        dfp.Aggregator(inputs=["value"], outputs=["user_mean"],
                       groupby=["user_id"], func="mean"),
        dfp.FunctionTransformer(inputs=["value"], outputs=["v2"],
                                func=lambda v: v * 2),
    ])
    pipe.fit(events)

    # stream source: the table plus 1000 duplicated events
    src = str(tmp_path / "events_e2e")
    events.union(events.limit(1000)).write.parquet(src)
    sdf = spark.readStream.schema(events.schema).parquet(src)
    composed = st.score_stream(
        pipe, st.dedup_stream(sdf, keys="event_id", watermark="1 hour"))
    st.run_to_memory(composed, name="e2e_t", mode="append")

    got = {r.event_id: (r.type_id, r.user_mean, r.v2)
           for r in spark.sql("SELECT * FROM e2e_t").collect()}
    exp = {r.event_id: (r.type_id, r.user_mean, r.v2)
           for r in st.score_stream(
               pipe, st.dedup_stream(events, keys="event_id")).collect()}
    assert len(got) == 10000
    assert got == exp


@pytest.fixture(scope="module")
def attribution_batch(spark):
    rows = [
        (0, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
        (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:25:00", 1, "purchase", 9.0, "{}"),  # clicks 0,1
        (3, "2024-01-01 01:20:00", 1, "purchase", 9.0, "{}"),  # none in 30m
        (4, "2024-01-01 00:05:00", 2, "click", 1.0, "{}"),
        (5, "2024-01-01 00:05:00", 2, "purchase", 9.0, "{}"),  # click 4 (== ts)
        (6, "2024-01-01 02:00:00", 3, "click", 1.0, "{}"),     # no purchase
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
              "value double, props string")
    return df.selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                         "event_type", "value", "props")


def test_click_attribution_batch(attribution_batch):
    ev = attribution_batch
    pairs = st.click_attribution(ev.filter("event_type = 'purchase'"),
                                 ev.filter("event_type = 'click'"))
    got = sorted((r.purchase_id, r.click_id) for r in pairs.collect())
    assert got == [(2, 0), (2, 1), (5, 4)]


def test_click_attribution_stream_stream_join(spark, attribution_batch,
                                              tmp_path):
    """The SAME interval-join plan run as an actual stream-stream join
    (two streaming sides, watermarks bounding both state stores) emits
    exactly the batch pair set."""
    src = str(tmp_path / "events_attr")
    attribution_batch.write.parquet(src)
    sdf = spark.readStream.schema(attribution_batch.schema).parquet(src)
    pairs = st.click_attribution(
        sdf.filter("event_type = 'purchase'"),
        sdf.filter("event_type = 'click'"),
        watermark="2 hours")
    assert pairs.isStreaming
    st.run_to_memory(pairs, name="attr_t", mode="append")
    got = sorted((r.purchase_id, r.click_id)
                 for r in spark.sql("SELECT * FROM attr_t").collect())
    assert got == [(2, 0), (2, 1), (5, 4)]


def test_idempotent_partition_sink_no_dups_on_replay(spark, events_batch,
                                                     tmp_path):
    """Replaying a batch through the dynamic-partition-overwrite sink
    rewrites partitions instead of appending — row counts are stable
    across a re-delivery, and only touched partitions are rewritten."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_out")
    ckpt1 = str(tmp_path / "ck1")
    events_batch.withColumn("etype", F.col("event_type")) \
        .write.parquet(src)
    schema = spark.read.parquet(src).schema

    sdf = spark.readStream.schema(schema).parquet(src)
    st.write_idempotent_partitions(sdf, out, "etype", ckpt1)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == events_batch.count()

    # simulate at-least-once re-delivery: fresh checkpoint, same source
    ckpt2 = str(tmp_path / "ck2")
    sdf2 = spark.readStream.schema(schema).parquet(src)
    st.write_idempotent_partitions(sdf2, out, "etype", ckpt2)
    again = spark.read.parquet(out)
    assert again.count() == n_first          # no duplicate rows
    # partition layout is prunable
    kinds = {r.etype for r in again.select("etype").distinct().collect()}
    assert kinds == {r.event_type for r in
                     events_batch.select("event_type").distinct().collect()}


def test_enrich_stream_static_join(spark, events_batch, tmp_path):
    """Stream-static dim enrichment executed as a real stream equals
    the batch join; unmatched stream rows survive (left join); no
    watermark or state required."""
    dim = spark.createDataFrame(
        [(1, "gold"), (3, "bronze")], "user_id long, tier string")
    src = str(tmp_path / "events_enrich")
    events_batch.write.parquet(src)
    sdf = spark.readStream.schema(events_batch.schema).parquet(src)
    enriched = st.enrich_stream(sdf, dim, on="user_id")
    assert enriched.isStreaming
    st.run_to_memory(enriched.select("event_id", "tier"),
                     name="enrich_t", mode="append")
    got = {r.event_id: r.tier
           for r in spark.sql("SELECT * FROM enrich_t").collect()}
    exp = {r.event_id: r.tier
           for r in st.enrich_stream(events_batch, dim, "user_id").collect()}
    assert got == exp
    assert got[3] is None          # user 2 not in dim -> left join keeps row
    assert got[0] == "gold"
    with pytest.raises(ValueError, match="stream-static"):
        st.enrich_stream(sdf, dim, "user_id", how="right")


def test_quarantine_works_on_streams(spark, events_batch, tmp_path):
    """The expectation suite's row-level quarantine is map-only, so the
    SAME suite gates a stream unchanged — good/bad splits match the
    batch result exactly."""
    from dataframe_pipeline_spark import expectations as ex

    suite = ex.ExpectationSuite(checks=[
        ex.in_set("event_type", ["click", "view", "purchase", "signup"]),
        ex.in_range("value", 0.0, 1000.0),
    ])
    src = str(tmp_path / "events_gate")
    events_batch.write.parquet(src)
    sdf = spark.readStream.schema(events_batch.schema).parquet(src)
    good_s, bad_s = suite.quarantine(sdf)
    assert good_s.isStreaming and bad_s.isStreaming
    st.run_to_memory(good_s, name="gate_good", mode="append")
    st.run_to_memory(bad_s, name="gate_bad", mode="append")
    good_b, bad_b = suite.quarantine(events_batch)
    assert (spark.sql("SELECT count(*) c FROM gate_good").head()["c"]
            == good_b.count())
    got_bad = {(r.event_id, tuple(r._failed)) for r in
               spark.sql("SELECT * FROM gate_bad").collect()}
    exp_bad = {(r.event_id, tuple(r._failed)) for r in bad_b.collect()}
    assert got_bad == exp_bad


def test_annotate_stream_matches_batch(spark, tmp_path):
    """annotate_stream produces the same (qid -> ordered nn_ids) map
    the batch AnnAnnotator.transform produces — the foreachBatch body
    IS the batch plan, scoped per micro-batch, with the fitted index
    static across batches."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.similarity import AnnAnnotator

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ann = AnnAnnotator(k=3, n_lists=4, n_probe=2).fit(emb)

    queries = emb.filter(F.col("vec_id") < 8)
    src = str(tmp_path / "ann_src")
    # two files so availableNow exercises >1 logical source split
    queries.repartition(2).write.parquet(src)
    sdf = spark.readStream.schema(queries.schema).parquet(src)

    out = str(tmp_path / "ann_out")
    st.annotate_stream(ann, sdf, out, str(tmp_path / "ann_ckpt"))

    got = {r.vec_id: (list(r.nn_ids), [round(c, 9) for c in r.nn_cosines])
           for r in spark.read.parquet(out).collect()}
    exp = {r.vec_id: (list(r.nn_ids), [round(c, 9) for c in r.nn_cosines])
           for r in ann.transform(queries).collect()}
    assert got == exp
    assert len(got) == 8


def test_score_stream_rejects_batch_scoped_steps(spark, tmp_path):
    """A pipeline carrying a batch-scoped step (AnnAnnotator) must be
    rejected by score_stream with a pointer to foreachBatch, instead
    of dying at sink start with Spark's opaque watermark-less
    streaming-aggregation AnalysisException."""
    import pytest as _pytest

    from dataframe_pipeline_spark import DataframePipeline
    from dataframe_pipeline_spark.similarity import AnnAnnotator

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pipe = DataframePipeline(steps=[AnnAnnotator(k=3, n_lists=4, n_probe=2)])
    pipe.fit(emb)

    src = str(tmp_path / "reject_src")
    emb.limit(5).write.parquet(src)
    sdf = spark.readStream.schema(emb.schema).parquet(src)
    with _pytest.raises(ValueError, match="annotate_stream"):
        st.score_stream(pipe, sdf)
    # batch input stays untouched by the guard
    assert st.score_stream(pipe, emb.limit(5)).count() == 5
