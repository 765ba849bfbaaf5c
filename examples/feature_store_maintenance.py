"""Feature-store maintenance loop: the nightly batch that keeps a
serving-ready feature table fresh without rescanning history.

Day N's change batch flows through:

1. ``merge_latest`` — CDC-upsert the user profile snapshot (latest
   wins, idempotent on replays).
2. ``scd2`` — append-only HISTORY of each user's segment changes
   (validity intervals, no-op updates collapsed) for point-in-time
   training joins.
3. ``IncrementalRollup`` — fold the batch's activity into persisted
   per-user aggregates (exact decimal partials: bit-identical to a
   full recompute, verified here).
4. ``resample`` — the gap-filled daily activity grid the sequence
   models read.
5. ``serving_transform`` — score one fresh request against the
   updated state, job-free.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataframe_pipeline_spark as dfp
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = dfp.get_spark("feature_store_maintenance")
    from dataframe_pipeline_spark.ext_queries import _events
    from dataframe_pipeline_spark.relational import IncrementalRollup, scd2
    from dataframe_pipeline_spark.sources import merge_latest
    from dataframe_pipeline_spark.timeseries import resample

    events = _events(spark, SF)
    history = events.filter(F.col("ts") < "2024-01-25")
    batch = events.filter(F.col("ts") >= "2024-01-25")

    # 1. CDC snapshot of each user's latest event profile
    def profile_of(ev):
        return ev.select("user_id", F.col("ts").alias("version"),
                         "event_type", "value")
    snapshot = merge_latest(profile_of(history), profile_of(batch),
                            key="user_id", version_col="version")
    print(f"[fsm] snapshot: {snapshot.count()} users after CDC merge")

    # 2. SCD2 history of segment (event_type) changes
    hist = scd2(events.select("user_id", "ts", "event_type"),
                key="user_id", version_col="ts")
    n_cur = hist.filter("is_current").count()
    print(f"[fsm] scd2: {hist.count()} intervals, {n_cur} current")

    # 3. fold the batch into the persisted rollup; verify vs recompute
    roll = IncrementalRollup("user_id", {"value_total": "value"})
    state = roll.merge(roll.init(history), batch)
    folded = {r.user_id: r.value_total for r in roll.read(state).collect()}
    full = {r.user_id: r.value_total
            for r in roll.read(roll.init(events)).collect()}
    assert folded == full, "incremental fold must equal full recompute"
    print(f"[fsm] rollup: {len(folded)} users, fold == full recompute")

    # 4. gap-filled daily activity grid
    grid = resample(events, "user_id", "ts", 86400,
                    aggs={"n": ("count", "event_id"),
                          "v": ("sum", "value")})
    zeros = grid.filter("n = 0").count()
    print(f"[fsm] resample: {grid.count()} user-days, {zeros} gap-filled")

    # 5. serve one request against the refreshed state, job-free
    pipe = dfp.DataframePipeline(steps=[
        dfp.ComplementLabelEncoder(inputs=["event_type"],
                                   outputs=["type_id"]),
        dfp.Aggregator(inputs=["value"], outputs=["user_mean"],
                       groupby=["user_id"], func="mean"),
    ])
    pipe.fit(events)
    row = events.head()
    out = dfp.serve_rows(pipe, spark, [row], events.schema)[0]
    print(f"[fsm] served user {out['user_id']}: type_id={out['type_id']}, "
          f"user_mean={out['user_mean']:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
