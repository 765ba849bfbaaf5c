"""Structured Streaming surface over the events table.

The reference is batch-only; this is the beyond-reference streaming
path.  The transformations are written **batch/stream unified**: the
same function builds the plan for a static DataFrame (oracle-checkable)
and a streaming DataFrame (``readStream`` file source), which is the
idiomatic Structured Streaming design — one logical plan, two
execution modes.

Scale notes: event-time tumbling windows + watermarks bound state;
``session_window`` gives gap-based sessionization with mergeable state;
both aggregate with partial (map-side) combine before the keyed state
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(f"{sf_dir}/events.parquet")
    )


def hourly_agg(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour event-time aggregation per event type.

    Works identically on batch and streaming inputs; pass a watermark
    (e.g. ``'2 hours'``) on the streaming side to bound state and emit
    finals in append mode.
    """
    if watermark:
        events = events.withWatermark("ts", watermark)
    # value is exactly representable at 6 decimals, so summing in
    # DECIMAL is lossless AND reduction-order independent — a double
    # sum's order varies with partitioning and flipped the last ulp of
    # one avg at sf0.1 vs the oracle.  Cast back to double AFTER the
    # exact sum; the division then operates on identical doubles in
    # every engine.
    vdec = F.sum(F.col("value").cast("decimal(18,6)"))
    aggs = [F.count(F.lit(1)).alias("n"),
            F.round(vdec.cast("double") / F.count(F.lit(1)), 6)
            .alias("avg_value"),
            F.round(vdec.cast("double"), 6).alias("sum_value")]
    if events.isStreaming:
        return (
            events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(*aggs)
            .select(F.col("w.start").alias("hour_ts"), "event_type",
                    "n", "avg_value", "sum_value")
        )
    # Batch (r13, guide §1.2): a 1-hour tumbling window start IS
    # date_trunc('hour') — grouping on the plain timestamp instead of
    # the two-field window struct hashes narrower keys and skips the
    # per-row struct build (sf1 interleaved A/B: 1.19 → 0.97 s, 3600
    # output rows identical).  Streaming keeps F.window: watermarks
    # only bind to event-time window aggregates.
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"),
                       "event_type")
        .agg(*aggs)
        .select("hour_ts", "event_type", "n", "avg_value", "sum_value")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes",
                  watermark: str | None = None) -> DataFrame:
    """Gap-based sessions per user — batch/stream unified result.

    Streaming: ``session_window`` (mergeable session state, the only
    gap-session primitive valid under incremental execution).

    Batch (r13, guide §2.4/§1.2): lag + running-sum session ids over ONE
    user-partitioned sort, then a hash aggregate.  ``session_window``'s
    batch execution pays a sort-BASED aggregate that re-merges session
    ranges per key (UpdatingSessionsIterator); the window form sorts
    once and aggregates by hash.  sf1 interleaved A/B min-of-6: 2.11 →
    0.77 s, result identical row-for-row (954 883 rows) — a session
    boundary is exactly ``ts - prev_ts >= gap`` in both forms, ties
    order-independent (gap 0 never splits), and min/count/decimal-sum
    are order-independent aggregates."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    if events.isStreaming:
        return (
            events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 # exact decimal sum — see hourly_agg
                 F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                         .cast("double"), 6).alias("session_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events", "session_value")
        )
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col("ts") >= prev + F.expr(f"INTERVAL {gap}")), 1).otherwise(0)
    sid = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        events.select("user_id", "ts", "value", sid.alias("__sid"))
        .groupBy("user_id", "__sid")
        .agg(F.min("ts").alias("session_start"),
             F.count(F.lit(1)).alias("n_events"),
             # exact decimal sum — see hourly_agg
             F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                     .cast("double"), 6).alias("session_value"))
        .select("user_id", "session_start", "n_events", "session_value")
    )


def user_totals(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` — the escape hatch for stateful logic the
    built-in windowed aggregations can't express (counters that survive
    across micro-batches, conditional state machines, TTL'd features).

    State per user: (n_events, total_value).  Each micro-batch folds its
    rows into the state and emits the updated snapshot, so the sink gets
    one up-to-date row per user per batch.  State is partitioned by the
    group key across executors; with ``timeout_ms`` idle users are
    evicted (bounded state at 100 TB).

    On a **batch** frame the same fold runs once per group via
    ``applyInPandas`` (state starts empty and sees all rows — exactly
    one micro-batch), so the operator is batch/stream unified like
    ``dedup_stream``: the batch result equals the stream's final
    snapshots (asserted in test_streaming.py) and is oracle-checked
    against ``GROUP BY user_id`` SQL (``events_user_totals``).
    """
    out_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    # The fold reads only (user_id, value): project BEFORE the Arrow
    # boundary so the worker never serializes the wide props blob
    # (guide §4 — pass only the columns the function needs).
    events = events.select("user_id", "value")

    if not events.isStreaming:
        # Batch twin of the stream fold, at partition granularity: one
        # Python call PER TASK (mapInPandas over a user-hash shuffle),
        # folding each Arrow chunk into a state dict exactly like the
        # micro-batch loop above — not one pandas round-trip per group,
        # whose fixed cost dominated (applyInPandas A/B at sf0.1:
        # 100k rows/1500 users, 2.33 s -> 0.26 s; guide §4.4).
        def fold_partition(batches):
            import pandas as pd  # local import: runs inside the worker
            state: dict = {}
            for pdf in batches:
                g = (pdf.groupby("user_id", dropna=False)["value"]
                        .agg(n="size", total="sum"))
                for uid, row in g.iterrows():
                    key = uid if pd.notna(uid) else None
                    n0, t0 = state.get(key, (0, 0.0))
                    state[key] = (n0 + int(row["n"]),
                                  t0 + float(row["total"]))
            if state:
                yield pd.DataFrame({
                    "user_id": list(state.keys()),
                    "n_events": [v[0] for v in state.values()],
                    "total_value": [v[1] for v in state.values()],
                })

        return events.repartition("user_id").mapInPandas(
            fold_partition, out_schema)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        import pandas as pd  # local import: runs inside the Python worker
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
               else GroupStateTimeout.NoTimeout)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(fold, out_schema, state_schema,
                                "update", timeout)
    )


def dedup_stream(events: DataFrame, keys: list[str] | str = "event_id",
                 watermark: str = "1 hour", ts_col: str = "ts") -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only while it can
    still collide under the watermark, so state size is O(keys per
    watermark window), not O(all history).  On a batch frame it degrades
    to plain ``dropDuplicates`` (same result set semantics)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(keys))
    return events.dropDuplicates(keys)


def ingest_dedup_stream(docs: DataFrame, content_col: str = "text",
                        watermark: str = "1 hour",
                        ts_col: str = "ts") -> DataFrame:
    """Streaming CONTENT dedup for a document ingest feed (VERDICT r11
    #8): reduce each arriving document to its 256-bit digest and
    ``dropDuplicatesWithinWatermark`` on it — the streaming twin of
    :class:`dedup.IncrementalDeduplicator`'s within-batch half.  State
    holds one 64 B digest per distinct document seen inside the
    watermark horizon (O(docs per window), never O(corpus)), and the
    dedup key is the digest, not the body, so the state store carries
    64 B/doc exactly like the batch index.  On a batch frame it
    degrades to ``dropDuplicates`` on the same digest (same survivor
    row-set semantics up to which duplicate is kept — project to the
    digest for deterministic comparison)."""
    d = docs.withColumn(
        "__digest", F.sha2(F.col(content_col).cast("binary"), 256))
    if d.isStreaming:
        return (d.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(["__digest"]))
    return d.dropDuplicates(["__digest"])


def click_attribution(purchases: DataFrame, clicks: DataFrame,
                      horizon_min: int = 30,
                      watermark: str | None = None) -> DataFrame:
    """Interval join: each purchase paired with the same user's clicks
    in the preceding ``horizon_min`` minutes (inclusive bounds) — the
    attribution shape of an event pipeline, batch/stream unified.

    On streaming inputs this is a **stream-stream join**: both sides
    carry a watermark and the join condition bounds event time on both
    ends, so Spark can size the state store — each side's buffered rows
    are dropped once the watermark passes ``ts + horizon``; state is
    O(events per watermark+horizon window), not O(history).  Inner
    joins emit eagerly as matches arrive (the watermark only gates
    state eviction), so a bounded replay yields the complete pair set.

    On batch inputs the same plan is a SortMergeJoin on ``user_id``
    with the time range as a join filter — quadratic only within one
    user's events inside the horizon.  Skewed power-users are the AQE
    skew-join case, same as any keyed self-join here.
    """
    if watermark:
        purchases = purchases.withWatermark("ts", watermark)
        clicks = clicks.withWatermark("ts", watermark)
    p = purchases.select(F.col("event_id").alias("purchase_id"),
                         "user_id", F.col("ts").alias("p_ts"))
    c = clicks.select(F.col("user_id").alias("__c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
    cond = ((p["user_id"] == c["__c_user"])
            & (c["c_ts"] <= p["p_ts"])
            & (c["c_ts"] >= p["p_ts"] - F.expr(f"INTERVAL {horizon_min} MINUTES")))
    return (p.join(c, cond, "inner")
            .select("purchase_id", "user_id", "click_id", "c_ts", "p_ts"))


def score_stream(pipeline, events: DataFrame) -> DataFrame:
    """Online scoring: apply a *fitted* pipeline to a streaming frame.

    The reference's 'online' deploy shape loops single-row frames through
    Python (RunBench.py:69-77); the Spark-first analog is the same
    fitted transform applied to a micro-batched stream.  This works
    because transform is a pure Column plan over the input plus
    stream-static joins against the fitted lookup DataFrames (encoder
    dictionaries, grouped aggregates) — both valid on streaming frames;
    fit-time statistics are frozen, exactly like the reference's fitted
    replay.

    Steps whose transform is BATCH-SCOPED (contains an aggregation +
    join-back — the ``_dfp_batch_scoped`` marker, e.g. AnnAnnotator)
    cannot run as a plain unbounded stream plan: Spark would reject
    the watermark-less streaming aggregation with an opaque
    AnalysisException at sink start.  Fail fast here with the right
    pointer instead — route such pipelines through ``foreachBatch``
    (``annotate_stream`` for the ANN stage) where each micro-batch
    runs the exact batch plan."""
    if events.isStreaming:
        steps = getattr(pipeline, "steps", [])
        bad = [type(s).__name__ for s in steps
               if getattr(type(s), "_dfp_batch_scoped", False)]
        if bad:
            raise ValueError(
                f"steps {bad} are batch-scoped (aggregation + join-back) "
                f"and cannot run as a plain stream plan; use foreachBatch "
                f"— see streaming.annotate_stream for the ANN stage")
    return pipeline.transform(events)


def enrich_stream(events: DataFrame, dim: DataFrame,
                  on: str | list[str], how: str = "left") -> DataFrame:
    """Stream-static dim enrichment: join a streaming frame against a
    batch dimension table (user profile, device registry, geo lookup).

    Stream-static joins need no watermark and keep no state — each
    micro-batch hash-joins against the static side, which Spark
    re-plans per batch (a broadcast under AQE when the dim is small,
    so the streaming side is map-only).  Inner and left-outer are the
    spec-supported types for a static right side; right/full would
    need the unmatched STATIC rows emitted once per trigger, which is
    undefined — rejected here with the same contract as salted_join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"stream-static join supports inner/left/semi/anti, not {how!r}")
    return events.join(dim, on=on, how=how)


def write_idempotent_partitions(sdf: DataFrame, path: str,
                                partition_col: str,
                                checkpoint: str) -> "object":
    """Exactly-once-effect file sink: every micro-batch dynamically
    OVERWRITES only the partitions it touches, so a replayed batch
    (post-crash re-delivery — Structured Streaming's at-least-once
    foreachBatch contract) rewrites the same partition files instead of
    appending duplicates.  The standard idempotent-upsert recipe for a
    parquet lake without a transactional table format; with Delta/Iceberg
    the same ``foreachBatch`` body becomes a MERGE.

    Scale notes: dynamic partition-overwrite touches only partitions
    present in the batch (partitionOverwriteMode=dynamic, scoped to the
    write, not session-global); the checkpoint carries batch lineage so
    restarts resume, and downstream readers partition-prune on
    ``partition_col``.
    """
    def upsert(batch_df: DataFrame, batch_id: int):
        (batch_df.write
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite")
         .partitionBy(partition_col)
         .parquet(path))

    q = (sdf.writeStream.foreachBatch(upsert)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def annotate_stream(ann, sdf: DataFrame, path: str,
                    checkpoint: str) -> "object":
    """Streaming twin of ``similarity.AnnAnnotator.transform``: each
    micro-batch of embedding rows is annotated with its top-k ANN
    neighbours from the FITTED (static) index and appended to a
    parquet sink — the retrieval step of a continuously-ingesting
    training-data pipeline (RAG corpus refresh, dedup-aware intake).

    ``foreachBatch`` is the right vehicle, not a plain stream plan:
    the annotate plan contains a per-query aggregation (the sort_array
    fold) and a join back onto the input — as a streaming aggregation
    that would accrete watermark state, but scoped to a micro-batch it
    is the exact batch plan batch mode runs, so stream/batch parity is
    bit-exact (tested) and state is bounded by the batch.  The fitted
    index side is static; when it is the reloaded
    ``__list``-partitioned layout, every micro-batch's cell join
    partition-prunes to the probed cells.  Restart-safe via the
    checkpoint; the sink appends by batch, so replays of an
    acknowledged batch should go through
    ``write_idempotent_partitions``-style dynamic overwrite if the
    sink must be exactly-once-effect."""
    def annotate(batch_df: DataFrame, batch_id: int):
        ann.transform(batch_df).write.mode("append").parquet(path)

    q = (sdf.writeStream.foreachBatch(annotate)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def run_to_memory(sdf: DataFrame, name: str, mode: str = "complete"):
    """Drain a (bounded) stream into an in-memory table; returns the
    query after completion.  Test/demo harness — production sinks are
    kafka/parquet/delta via the same ``writeStream`` call."""
    q = (
        sdf.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return q
