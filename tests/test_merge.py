"""merge_latest (CDC upsert), kfold_assign, label_centroids."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.similarity import label_centroids
from dataframe_pipeline_spark.sources import kfold_assign, merge_latest


@pytest.fixture()
def snap(spark):
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)],
        "id long, val string, v long")
    updates = spark.createDataFrame(
        [(2, "B", 2),          # newer version wins
         (3, "cc", 1),         # SAME version: update side wins (idempotent)
         (4, "d", 2)],         # brand-new key inserted
        "id long, val string, v long")
    return base, updates


def test_merge_latest_wins(spark, snap):
    base, updates = snap
    out = merge_latest(base, updates, "id", "v")
    got = {r.id: (r.val, r.v) for r in out.collect()}
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("cc", 1), 4: ("d", 2)}


def test_merge_is_idempotent(spark, snap):
    base, updates = snap
    once = merge_latest(base, updates, "id", "v")
    twice = merge_latest(once, updates, "id", "v")
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_merge_tombstones(spark):
    base = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False)],
        "id long, val string, v long, deleted boolean")
    updates = spark.createDataFrame(
        [(2, "b", 2, True), (3, "c", 2, None)],   # NULL deleted = kept
        "id long, val string, v long, deleted boolean")
    out = merge_latest(base, updates, "id", "v", delete_col="deleted")
    assert sorted(r.id for r in out.collect()) == [1, 3]
    assert "deleted" not in out.columns


def test_merge_rejects_schema_drift(spark):
    base = spark.createDataFrame([(1, "a", 1)], "id long, val string, v long")
    updates = spark.createDataFrame([(2, 2)], "id long, v long")  # no val
    with pytest.raises(Exception):
        merge_latest(base, updates, "id", "v").collect()


def test_kfold_partition_and_determinism(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = kfold_assign(df, "k", 5)
    rows = out.collect()
    folds = {r.fold for r in rows}
    assert folds == {0, 1, 2, 3, 4}
    # stable across re-evaluation and partitioning
    again = {r.k: r.fold for r in
             kfold_assign(df.repartition(7), "k", 5).collect()}
    assert all(again[r.k] == r.fold for r in rows)
    # no fold starved (md5 is uniform-ish: 1000 rows over 5 folds)
    from collections import Counter
    c = Counter(r.fold for r in rows)
    assert min(c.values()) > 100
    with pytest.raises(ValueError, match="k must be"):
        kfold_assign(df, "k", 1)


def test_kfold_is_shuffle_free(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    plan = kfold_assign(df, "k", 4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_label_centroids_values(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<double>")
    out = label_centroids(df)
    got = {(r.label, r.pos): r.centroid for r in out.collect()}
    assert got == {(0, 0): 2.0, (0, 1): 3.0, (1, 0): 10.0, (1, 1): 20.0}


def test_label_centroids_partial_agg(spark):
    """The explode must collapse map-side: plan shows a partial
    aggregate below the exchange (explode never crosses the wire)."""
    df = spark.createDataFrame(
        [(i % 3, [float(i), float(i * 2)]) for i in range(100)],
        "label int, embedding array<double>")
    out = label_centroids(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex = plan.index("Exchange")
    assert "partial_avg" in plan[ex:]        # partial agg below the shuffle


def test_snapshot_diff_classification(spark):
    from dataframe_pipeline_spark.sources import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, s string, v double")
    new = spark.createDataFrame(
        [(2, "b", 2.0),          # unchanged
         (3, "c", 3.0),          # NULL -> value = changed
         (4, "D", 4.0),          # string changed
         (5, "e", 5.0)],         # added
        "id long, s string, v double")
    got = {r.id: r.status
           for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "changed", 5: "added"}


def test_snapshot_diff_null_keys_and_subset(spark):
    from dataframe_pipeline_spark.sources import snapshot_diff
    old = spark.createDataFrame([(1, "x", 10.0)], "id long, s string, v double")
    new = spark.createDataFrame([(1, "y", 10.0)], "id long, s string, v double")
    # compare only v -> unchanged despite s differing
    got = snapshot_diff(old, new, "id", compare=["v"]).collect()
    assert got[0].status == "unchanged"
