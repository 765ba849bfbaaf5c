"""Sources & data-prep helpers: CSV schema read, joins, splits, sampling."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark import sources as src


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(20)],
        "id long, name string, v double")


def test_read_csv_with_schema(spark, tmp_path, frame):
    p = str(tmp_path / "t.csv")
    frame.write.option("header", "true").csv(p)
    out = src.read_csv(spark, p, schema="id long, name string, v double",
                       columns=["id", "v"])
    assert out.columns == ["id", "v"]
    assert out.schema["id"].dataType.typeName() == "long"
    assert out.count() == 20


def test_left_enrich_broadcast(spark, frame):
    dim = spark.createDataFrame([(0, "zero"), (1, "one")], "id long, label string")
    out = src.left_enrich(frame, dim, on="id")
    assert out.count() == 20
    assert out.filter(F.col("label").isNull()).count() == 18
    # the plan must broadcast the dim side
    assert "Broadcast" in out._jdf.queryExecution().executedPlan().toString()


def test_split_mod_partitions_everything(frame):
    train, test = src.split_mod(frame, key="id", modulus=4, test_residue=3)
    assert train.count() == 15 and test.count() == 5
    assert train.intersect(test).count() == 0


def test_split_positional_order(frame):
    train, test = src.split_positional(frame, order_by="id", train_frac=0.75)
    assert train.count() == 15 and test.count() == 5
    assert train.agg(F.max("id")).first()[0] == 14
    assert test.agg(F.min("id")).first()[0] == 15


def test_sample_deterministic(frame):
    a = sorted(r.id for r in src.sample_rows(frame, 0.5, seed=7).collect())
    b = sorted(r.id for r in src.sample_rows(frame, 0.5, seed=7).collect())
    assert a == b
