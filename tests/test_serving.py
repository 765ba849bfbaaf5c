"""serving.py: literal-map compilation of fitted pipelines for online
scoring — result parity with the batch transform, full LocalRelation
fold (collect launches no job), and inline-VALUES row rendering."""

import datetime as dt
import math

import pandas as pd
import pytest

import dataframe_pipeline_spark as dfp
from dataframe_pipeline_spark.serving import (SERVING_MAX_ROWS,
                                              local_rows_df, serve_rows)


def _fitted_pipe(spark):
    from dataframe_pipeline_spark.ext_queries import _events

    ev = _events(spark, "/root/testdata/sf0.001")
    pipe = dfp.DataframePipeline(steps=[
        dfp.ComplementLabelEncoder(inputs=["event_type"], outputs=["type_id"]),
        dfp.Aggregator(inputs=["value"], outputs=["user_mean"],
                       groupby=["user_id"], func="mean"),
        dfp.FrequencyEncoder(inputs=["event_type"], outputs=["type_freq"]),
        dfp.Scaler(inputs=["value"], outputs=["value_mm"], strategy="minmax"),
    ])
    pipe.fit(ev)
    return pipe, ev


def test_serving_parity_with_batch(spark):
    pipe, ev = _fitted_pipe(spark)
    rows = ev.limit(40).collect()
    batch = (pipe.transform(spark.createDataFrame(rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    serve = (pipe.serving_transform(local_rows_df(spark, rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(batch, serve, check_like=True)


def test_serving_plan_folds_to_local_relation(spark):
    """The whole compiled transform over an inline-VALUES input must
    collapse to LocalTableScan — no joins, no exchanges, no jobs."""
    pipe, ev = _fitted_pipe(spark)
    plan = pipe.serving_transform(
        local_rows_df(spark, [ev.head()], ev.schema))
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.strip().startswith("LocalTableScan"), phys
    assert "Join" not in phys and "Exchange" not in phys


def test_serving_unseen_category_default(spark):
    pipe, ev = _fitted_pipe(spark)
    row = ev.head().asDict()
    row["event_type"] = "never_seen_category"
    out = serve_rows(pipe, spark, [row], ev.schema)[0]
    batch = pipe.transform(
        spark.createDataFrame([tuple(row[f.name] for f in ev.schema.fields)],
                              ev.schema)).collect()[0]
    assert out["type_id"] == batch["type_id"]     # extra_category_ id
    assert out["type_freq"] == batch["type_freq"] == 1  # unseen count=1


def test_serving_unseen_group_null(spark):
    pipe, ev = _fitted_pipe(spark)
    row = ev.head().asDict()
    row["user_id"] = 10**12  # never-fitted group -> left-join miss -> NULL
    out = serve_rows(pipe, spark, [row], ev.schema)[0]
    assert out["user_mean"] is None


def test_serving_oversized_lookup_falls_back_to_join(spark):
    from dataframe_pipeline_spark.ext_queries import _events

    ev = _events(spark, "/root/testdata/sf0.001")
    enc = dfp.ComplementLabelEncoder(inputs=["event_type"],
                                     outputs=["type_id"])
    enc.fit(ev)
    # force the gate: pretend the dictionary exceeds the inline cap
    lookup, default_id, _n = enc._lookups["event_type"]
    enc._lookups["event_type"] = (lookup, default_id, SERVING_MAX_ROWS + 1)
    pipe = dfp.DataframePipeline(steps=[enc])
    out = pipe.serving_transform(local_rows_df(spark, [ev.head()], ev.schema))
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in phys  # fell back to the batch join plan
    assert out.collect()[0]["type_id"] is not None


def test_local_rows_df_type_fidelity(spark):
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType, TimestampType)

    schema = StructType([
        StructField("i", LongType()), StructField("x", DoubleType()),
        StructField("s", StringType()), StructField("t", TimestampType()),
    ])
    rows = [
        (1, float("nan"), "it's \\ tricky", dt.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (None, -0.0, None, None),
        (2, float("inf"), "", dt.datetime(1970, 1, 1)),
    ]
    df = local_rows_df(spark, rows, schema)
    assert df.schema == schema
    got = df.collect()
    assert got[0]["i"] == 1 and math.isnan(got[0]["x"])
    assert got[0]["s"] == "it's \\ tricky"
    assert got[0]["t"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert got[1]["i"] is None and got[1]["s"] is None and got[1]["t"] is None
    assert got[2]["x"] == float("inf") and got[2]["s"] == ""
    # and it is a LocalRelation, not a Python RDD
    assert "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()


def test_local_rows_df_empty_raises(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    with pytest.raises(ValueError, match="at least one row"):
        local_rows_df(spark, [], StructType([StructField("i", LongType())]))


def test_serving_target_encoder_parity(spark):
    from dataframe_pipeline_spark.operators.target_encoder import TargetEncoder

    ev = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    te = TargetEncoder(inputs=["o_orderstatus"], outputs=["status_te"],
                       target="o_totalprice", smoothing=10.0)
    te.fit(ev)
    pipe = dfp.DataframePipeline(steps=[te])
    rows = ev.limit(20).collect()
    batch = (pipe.transform(spark.createDataFrame(rows, ev.schema))
             .toPandas().sort_values("o_orderkey").reset_index(drop=True))
    serve = (pipe.serving_transform(local_rows_df(spark, rows, ev.schema))
             .toPandas().sort_values("o_orderkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(batch, serve, check_like=True)
    plan = pipe.serving_transform(local_rows_df(spark, rows[:1], ev.schema))
    assert plan._jdf.queryExecution().executedPlan().toString() \
        .strip().startswith("LocalTableScan")
    # unseen category -> global mean, same as the batch join miss
    row = rows[0].asDict()
    row["o_orderstatus"] = "Z"
    out = serve_rows(pipe, spark, [row], ev.schema)[0]
    assert out["status_te"] == pytest.approx(te.global_mean_)


def test_serving_wrap_label_encoder_parity(spark):
    class LabelEncoder:  # sklearn stand-in, recognized by class name
        pass

    from dataframe_pipeline_spark.ext_queries import _events

    ev = _events(spark, "/root/testdata/sf0.001")
    w = dfp.WrapTransformer(inputs=["event_type"], outputs=["type_code"],
                            transformer=LabelEncoder())
    w.fit(ev)
    pipe = dfp.DataframePipeline(steps=[w])
    rows = ev.limit(20).collect()
    batch = (pipe.transform(spark.createDataFrame(rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    serve = (pipe.serving_transform(local_rows_df(spark, rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(batch, serve, check_like=True)
    plan = pipe.serving_transform(local_rows_df(spark, rows[:1], ev.schema))
    assert plan._jdf.queryExecution().executedPlan().toString() \
        .strip().startswith("LocalTableScan")


def test_serving_woe_encoder_parity(spark):
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.ext_queries import _events
    from dataframe_pipeline_spark.operators import WOEEncoder

    ev = _events(spark, "/root/testdata/sf0.001").withColumn(
        "y", (F.col("value") > 0).cast("int"))
    enc = WOEEncoder(inputs=["event_type"], outputs=["type_woe"],
                     target="y")
    enc.fit(ev)
    pipe = dfp.DataframePipeline(steps=[enc])
    rows = ev.limit(20).collect()
    batch = (pipe.transform(spark.createDataFrame(rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    serve = (pipe.serving_transform(local_rows_df(spark, rows, ev.schema))
             .toPandas().sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(batch, serve, check_like=True)
    # job-free: the WOE lookup compiles to a literal map, no join plan
    plan = pipe.serving_transform(local_rows_df(spark, rows[:1], ev.schema))
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.strip().startswith("LocalTableScan"), phys
    assert "Join" not in phys
    # unseen category -> 0.0 (no evidence), same as the batch join miss
    row = rows[0].asDict()
    row["event_type"] = "never_seen"
    out = serve_rows(pipe, spark, [row], ev.schema)[0]
    assert out["type_woe"] == 0.0


def test_serving_cache_invalidated_on_refit(spark):
    """Refitting an operator must drop its compiled literal maps —
    otherwise serving_transform keeps scoring with the OLD fitted
    state while transform() uses the new one."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.ext_queries import _events

    ev = _events(spark, "/root/testdata/sf0.001")
    enc = dfp.ComplementLabelEncoder(inputs=["event_type"],
                                     outputs=["type_id"]).fit(ev)
    pipe = dfp.DataframePipeline(steps=[enc])
    head = ev.head()
    serve_rows(pipe, spark, [head], ev.schema)  # builds the literal cache
    # refit on a shifted vocabulary: every old category becomes unseen
    enc.fit(ev.withColumn("event_type", F.concat(F.lit("x_"),
                                                 "event_type")))
    batch = pipe.transform(
        spark.createDataFrame([head], ev.schema)).collect()[0]["type_id"]
    served = serve_rows(pipe, spark, [head], ev.schema)[0]["type_id"]
    assert served == batch  # stale cache would return the pre-refit id


def test_save_after_serving_and_serving_survives_reload(spark, tmp_path):
    """fit -> serve -> save must not crash on the cached Column handles,
    and a reloaded pipeline must rebuild its literal maps so the
    job-free serving path survives a process restart."""
    pipe, ev = _fitted_pipe(spark)
    head = ev.head()
    expected = serve_rows(pipe, spark, [head], ev.schema)[0]  # caches built
    path = str(tmp_path / "served_pipe")
    pipe.save(path)  # would crash if the py4j Columns were pickled
    fresh = spark.newSession()
    loaded = dfp.DataframePipeline.load(fresh, path)
    plan = loaded.serving_transform(local_rows_df(fresh, [head], ev.schema))
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.strip().startswith("LocalTableScan"), phys
    got = plan.collect()[0]
    for k, v in expected.asDict().items():
        g = got[k]
        if isinstance(v, float) and math.isnan(v):
            assert isinstance(g, float) and math.isnan(g), k
        else:
            assert g == v, k


def test_local_rows_df_tz_aware_datetime(spark):
    """tz-aware datetimes must render the UTC instant, matching what
    batch createDataFrame stores (session timezone is UTC)."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    schema = StructType([StructField("t", TimestampType())])
    aware = dt.datetime(2024, 1, 2, 3, 4, 5, 123456,
                        tzinfo=dt.timezone(dt.timedelta(hours=5)))
    batch = spark.createDataFrame([(aware,)], schema).collect()[0]["t"]
    local = local_rows_df(spark, [(aware,)], schema).collect()[0]["t"]
    assert local == batch == dt.datetime(2024, 1, 1, 22, 4, 5, 123456)


def test_serving_ann_annotator_parity_and_job_free(spark):
    """A pipeline with an ANN stage (r10, VERDICT r9 #7): batch
    transform (distributed search_batch join) and serving path
    (in-process replica probes) must agree on values, column order,
    and neighbour order — and the serving scoring path must launch
    ZERO Spark jobs (the collect inside the ANN compiler evaluates a
    folded LocalRelation; the rebuilt relation keeps folding through
    downstream steps)."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.similarity import AnnAnnotator

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pipe = dfp.DataframePipeline(steps=[
        AnnAnnotator(k=3, n_lists=4, n_probe=2),
        dfp.Scaler(inputs=["label"], outputs=["label_mm"],
                   strategy="minmax"),
    ])
    out = pipe.fit_transform(emb)
    want = {r["vec_id"]: (list(r["nn_ids"]),
                          [round(c, 6) for c in r["nn_cosines"]],
                          round(r["label_mm"], 9))
            for r in out.filter(F.col("vec_id") < 6).collect()}

    rows = emb.filter(F.col("vec_id") < 6).collect()
    served_df = pipe.serving_transform(
        local_rows_df(spark, rows, emb.schema))
    served_df.collect()                       # build caches/replica
    sc = spark.sparkContext
    sc.setJobGroup("ann-serve-gate", "must be job-free")
    got = {r["vec_id"]: (list(r["nn_ids"]),
                         [round(c, 6) for c in r["nn_cosines"]],
                         round(r["label_mm"], 9))
           for r in pipe.serving_transform(
               local_rows_df(spark, rows, emb.schema)).collect()}
    sc.setJobGroup(None, None)
    assert got == want
    assert sc.statusTracker().getJobIdsForGroup("ann-serve-gate") == []


def test_serving_ann_annotator_after_reload(spark, tmp_path):
    """The full deployment loop for an index-carrying pipeline (r10):
    fit -> save -> load -> serving_transform.  The reloaded step's
    replica cache was dropped at save (transient) and must rebuild
    lazily from the written __list-partitioned cell layout; served
    values must equal the pre-save batch transform."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.persistence import (load_pipeline,
                                                      save_pipeline)
    from dataframe_pipeline_spark.similarity import AnnAnnotator

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pipe = dfp.DataframePipeline(steps=[
        AnnAnnotator(k=3, n_lists=4, n_probe=2)])
    want = {r["vec_id"]: list(r["nn_ids"])
            for r in pipe.fit_transform(emb)
            .filter(F.col("vec_id") < 4).collect()}

    path = str(tmp_path / "ann_serve_pipe")
    save_pipeline(pipe, path)
    p2 = load_pipeline(spark, path)

    rows = emb.filter(F.col("vec_id") < 4).collect()
    got = {r["vec_id"]: list(r["nn_ids"])
           for r in p2.serving_transform(
               local_rows_df(spark, rows, emb.schema)).collect()}
    assert got == want
