"""Fitted-pipeline save/load round-trip (the reference's export analog:
fit once, persist learned state, score a new frame without refitting)."""

import pandas as pd

from dataframe_pipeline_spark import (
    Aggregator,
    ComplementLabelEncoder,
    DataframePipeline,
    FrequencyEncoder,
    FunctionTransformer,
    Scaler,
)


def _train(spark):
    pdf = pd.DataFrame({
        "cat": ["a", "b", "a", "c", "b", "a"],
        "grp": [1, 1, 2, 2, 2, 1],
        "x": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
    })
    return spark.createDataFrame(pdf)


def _test_frame(spark):
    # 'z' is unseen by the fitted encoders; grp 3 unseen by the aggregate.
    pdf = pd.DataFrame({
        "cat": ["b", "z"],
        "grp": [1, 3],
        "x": [25.0, 35.0],
    })
    return spark.createDataFrame(pdf)


def test_save_load_roundtrip(spark, tmp_path):
    pipe = DataframePipeline(steps=[
        ComplementLabelEncoder(inputs=["cat"], outputs=["cat_id"]),
        FrequencyEncoder(inputs=["cat"], outputs=["cat_freq"]),
        Aggregator(inputs=["x"], outputs=["x_mean_grp"], groupby=["grp"], func="mean"),
        Scaler(inputs=["x"], outputs=["x_mm"], strategy="minmax"),
        FunctionTransformer(inputs=["x"], outputs=["x2"], func=lambda v: v * 2),
    ])
    train = _train(spark)
    pipe.fit_transform(train)

    path = str(tmp_path / "fitted_pipe")
    pipe.save(path)
    loaded = DataframePipeline.load(spark, path)

    test = _test_frame(spark)
    exp = pipe.transform(test).toPandas().sort_values("x").reset_index(drop=True)
    got = loaded.transform(test).toPandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    # fitted semantics survived: unseen category -> extra_category_ id,
    # unseen freq -> fill, unseen group key -> null, scaler uses TRAIN min/max
    row_b, row_z = got.iloc[0], got.iloc[1]
    assert row_b["cat_id"] == 1          # 'b' fitted id (a=0, b=1, c=2, extra=3)
    assert row_z["cat_id"] == 3          # unseen -> extra_category_
    assert row_b["cat_freq"] == 2        # train count of 'b'
    assert row_b["x_mean_grp"] == 30.0   # train mean of grp 1
    assert pd.isna(row_z["x_mean_grp"])  # unseen group key
    assert abs(row_b["x_mm"] - 0.3) < 1e-9  # (25-10)/(60-10)
    assert row_z["x2"] == 70.0


def test_load_is_lazy_lookup(spark, tmp_path):
    """Reloaded encoder state is a parquet-backed DataFrame, not a dict."""
    le = ComplementLabelEncoder(inputs=["cat"], outputs=["cat_id"])
    pipe = DataframePipeline(steps=[le])
    pipe.fit(_train(spark))
    path = str(tmp_path / "le_pipe")
    pipe.save(path)

    loaded = DataframePipeline.load(spark, path)
    lookup, default_id, n = loaded.steps[0]._lookups["cat"]
    assert lookup.__class__.__name__ == "DataFrame"
    assert default_id == 3
    assert n == 4


def test_ivf_index_roundtrip(spark, tmp_path):
    """fit -> write -> read: identical search result, partitioned-by-cell
    layout on disk (the index IS the table at scale)."""
    import os

    from dataframe_pipeline_spark.similarity import IVFIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IVFIndex(k=5, n_lists=4, n_probe=2).fit(emb)
    before = idx.search(query_id=0).collect()

    path = str(tmp_path / "ivf")
    idx.write(path)
    cells = os.path.join(path, "frames", "s0_f0")
    parts = sorted(d for d in os.listdir(cells) if d.startswith("__list="))
    assert parts, "cell table must be written partitioned by __list"

    loaded = IVFIndex.read(spark, path)
    assert loaded.centroids_int == idx.centroids_int
    assert loaded.search(query_id=0).collect() == before


def test_lsh_index_roundtrip(spark, tmp_path):
    import os

    from dataframe_pipeline_spark.similarity import HyperplaneLSHIndex

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = list(emb.filter("vec_id = 0").head()["embedding"])

    idx = HyperplaneLSHIndex(k=5, n_planes=4).build(emb)
    before = idx.search_vec(qvec).collect()

    path = str(tmp_path / "lsh")
    idx.write(path)
    buckets = os.path.join(path, "frames", "s0_f0")
    assert any(d.startswith("__bucket=") for d in os.listdir(buckets))

    loaded = HyperplaneLSHIndex.read(spark, path)
    assert loaded.search_vec(qvec).collect() == before


def test_target_encoder_roundtrip(spark, tmp_path):
    """TargetEncoder's lookup DataFrames persist as parquet and reload
    as lazy scans; codes identical after reload."""
    from dataframe_pipeline_spark import TargetEncoder
    from dataframe_pipeline_spark.persistence import (load_operator,
                                                      save_operator)
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 99.0)],
        "id long, cat string, y double")
    enc = TargetEncoder(inputs=["cat"], outputs=["code"], target="y",
                        smoothing=1.0).fit(df)
    p = str(tmp_path / "te")
    save_operator(enc, p)
    enc2 = load_operator(spark, p)
    a = sorted((r.id, round(r.code, 9)) for r in enc.transform(df).collect())
    b = sorted((r.id, round(r.code, 9)) for r in enc2.transform(df).collect())
    assert a == b
    assert enc2.cards_ == enc.cards_      # broadcast gate state survives


def test_outlier_clipper_roundtrip(spark, tmp_path):
    from dataframe_pipeline_spark import OutlierClipper
    from dataframe_pipeline_spark.persistence import (load_operator,
                                                      save_operator)
    df = spark.createDataFrame([(float(v),) for v in range(100)], "x double")
    op = OutlierClipper(inputs=["x"], outputs=["y"], strategy="quantile",
                        lo_q=0.1, hi_q=0.9, exact=True).fit(df)
    p = str(tmp_path / "oc")
    save_operator(op, p)
    op2 = load_operator(spark, p)
    assert op2.bounds_ == op.bounds_
    a = [r.y for r in op.transform(df).orderBy("x").collect()]
    b = [r.y for r in op2.transform(df).orderBy("x").collect()]
    assert a == b


def test_ngram_scorer_roundtrip(spark, tmp_path):
    from dataframe_pipeline_spark.persistence import (load_operator,
                                                      save_operator)
    from dataframe_pipeline_spark.text import NgramScorer

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sc = NgramScorer(k=1.0).fit(docs, "text")
    path = str(tmp_path / "lm")
    save_operator(sc, path)
    sc2 = load_operator(spark, path)
    a = {r["doc_id"]: r["avg_logprob"]
         for r in sc.score(docs, "doc_id", "text").collect()}
    b = {r["doc_id"]: r["avg_logprob"]
         for r in sc2.score(docs, "doc_id", "text").collect()}
    assert a == b and sc2.vocab_size_ == sc.vocab_size_


def test_bpe_trainer_roundtrip(spark, tmp_path):
    from dataframe_pipeline_spark.bpe import BpeTokenizer, BpeTrainer
    from dataframe_pipeline_spark.persistence import (load_operator,
                                                      save_operator)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tr = BpeTrainer(n_merges=6).fit(docs, "text")
    path = str(tmp_path / "bpe")
    save_operator(tr, path)
    tr2 = load_operator(spark, path)
    assert tr2.merges_ == tr.merges_
    a = BpeTokenizer(tr.merges_).transform(docs.limit(3), "text").collect()
    b = BpeTokenizer(tr2.merges_).transform(docs.limit(3), "text").collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]


def test_ann_annotator_pipeline_roundtrip(spark, tmp_path):
    """A pipeline whose step CARRIES a fitted index object (AnnAnnotator
    -> IVFIndex -> cell DataFrame) survives save/load: the nested-object
    protocol decomposes the index field-by-field (its cell table written
    partitioned by __list, its serving-replica cache dropped as
    transient) instead of cloudpickling a py4j handle.  The reloaded
    step must transform identically, serve job-free via serve_rows
    (replica rebuilt lazily), and read its cells from the parquet
    layout."""
    from dataframe_pipeline_spark.persistence import (load_pipeline,
                                                      save_pipeline)
    from dataframe_pipeline_spark.similarity import AnnAnnotator

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pipe = DataframePipeline(steps=[AnnAnnotator(k=3, n_lists=4, n_probe=2)])
    pipe.fit(emb)
    # populate the replica cache so save must actually drop it
    pipe.steps[0].serve_rows([(0, [float(x) for x in
                                   emb.head()["embedding"]])])

    path = str(tmp_path / "ann_pipe")
    save_pipeline(pipe, path)
    p2 = load_pipeline(spark, path)

    q = emb.filter("vec_id < 3")
    exp = sorted((r.vec_id, list(r.nn_ids)) for r in pipe.transform(q).collect())
    got = sorted((r.vec_id, list(r.nn_ids)) for r in p2.transform(q).collect())
    assert got == exp
    # transient cache was dropped and rebuilds lazily after reload
    assert p2.steps[0].index._replica is None
    rows = [(r.vec_id, list(r.embedding)) for r in q.collect()]
    assert [ids for ids, _ in p2.steps[0].serve_rows(rows)] == \
        [ids for _, ids in exp]
    # the reloaded cell table is the written parquet layout, not a pickle
    plan = p2.steps[0].index._assigned._jdf.queryExecution() \
        .executedPlan().toString()
    assert "FileScan parquet" in plan


def test_fitted_aggregator_roundtrip_drops_fit_frame(spark, tmp_path):
    """A fitted GROUPED Aggregator persists its lookup table only —
    never the remembered fit input (ADVICE r12: without _dfp_transient
    the checkpoint wrote the ENTIRE training frame, fact-table-sized at
    scale).  Exactly one frame dir (the lookup); the reloaded step
    transforms a NEW frame identically via the lookup-join path."""
    import os

    from dataframe_pipeline_spark.persistence import (load_operator,
                                                      save_operator)

    agg = Aggregator(inputs=["x"], outputs=["x_mean_grp"],
                     groupby=["grp"], func="mean")
    train = _train(spark)
    agg.fit_transform(train)          # sets _fit_frame (window fast path)
    path = str(tmp_path / "agg_only")
    save_operator(agg, path)

    frames = sorted(os.listdir(os.path.join(path, "frames")))
    assert frames == ["s0_f0"], frames   # the lookup, NOT the fit frame

    agg2 = load_operator(spark, path)
    assert agg2._fit_frame is None       # transient restored as None
    test = _test_frame(spark)
    exp = {r["grp"]: r["x_mean_grp"]
           for r in agg.transform(test).collect()}
    got = {r["grp"]: r["x_mean_grp"]
           for r in agg2.transform(test).collect()}
    assert got == exp and got[3] is None   # unseen group key -> null
