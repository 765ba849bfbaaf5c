"""CountMinSketch (sketches.py) + BloomFilter (relational.py): golden
small-frame semantics, overestimate/no-false-negative guarantees, and
the scale properties (bounded sketch size, no data rescan at estimate,
literal-only bloom probe)."""

import pytest
from pyspark.sql import functions as F

from dataframe_pipeline_spark.relational import (BloomFilter,
                                                 bloom_prune_join)
from dataframe_pipeline_spark.sketches import CountMinSketch


@pytest.fixture(scope="module")
def keyed(spark):
    rows = ([("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
            + [(None,)])
    return spark.createDataFrame(rows, "k string")


def test_cms_estimates_are_exact_without_collisions(keyed, spark):
    cms = CountMinSketch(depth=4, width=1024)
    sk = cms.build(keyed, "k")
    # 3 distinct keys x 4 rows -> at most 12 cells, never width*depth
    assert sk.count() <= 12
    est = {r.key: r.est for r in
           cms.estimate(sk, ["a", "b", "c", "zz"]).collect()}
    assert est == {"a": 5, "b": 3, "c": 1, "zz": 0}


def test_cms_overestimates_never_under(spark):
    # width=2 forces collisions: est >= true for every key
    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    cms = CountMinSketch(depth=3, width=2)
    sk = cms.build(df, "k")
    true = {r.k: r.cnt for r in
            df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    est = {r.key: r.est for r in
           cms.estimate(sk, list(true)).collect()}
    assert all(est[k] >= true[k] for k in true)


def test_cms_merge_linearity(keyed, spark):
    """CMS is linear: cellwise sum of two batch sketches == sketch of
    the union — the incremental-maintenance property."""
    cms = CountMinSketch(depth=2, width=64)
    a = spark.createDataFrame([("a",)] * 2 + [("b",)] * 3, "k string")
    b = spark.createDataFrame([("a",)] * 3 + [("c",)], "k string")
    keyed = a.unionByName(b)
    merged = (cms.build(a, "k").unionByName(cms.build(b, "k"))
              .groupBy("__row", "__col")
              .agg(F.sum("__cnt").alias("__cnt")))
    whole = cms.build(keyed, "k")
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, whole.collect())))


def test_cms_guards():
    with pytest.raises(ValueError):
        CountMinSketch(depth=0)
    with pytest.raises(ValueError):
        CountMinSketch(width=1)


def test_bloom_no_false_negatives_and_null(keyed):
    bf = BloomFilter(bits=256, k_hashes=3).fit(keyed, "k")
    got = keyed.filter(bf.might_contain("k"))
    # every non-null key passes; NULL never does
    assert got.filter(F.col("k").isNull()).count() == 0
    assert got.count() == 9


def test_bloom_rejects_most_foreign_keys(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(20)],
                                    "k string")
    foreign = spark.createDataFrame([(f"x{i}",) for i in range(500)],
                                    "k string")
    bf = BloomFilter(bits=8192, k_hashes=3).fit(members, "k")
    fp = foreign.filter(bf.might_contain("k")).count()
    # expected fp rate ~ (1-exp(-3*20/8192))^3 ~ 4e-7; allow slack
    assert fp <= 2


def test_bloom_prune_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 10) for i in range(300)], "row_id long, k long")
    dim = spark.createDataFrame([(2, "two"), (7, "seven")],
                                "k long, name string")
    pruned = bloom_prune_join(fact, dim, on="k").collect()
    plain = fact.join(dim, "k").collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, plain))


def test_bloom_prune_probe_is_literal_only(spark):
    """The pruned scan must contain no join/exchange before the real
    join: bloom membership is literal arithmetic in the filter."""
    fact = spark.createDataFrame([(i,) for i in range(50)], "k long")
    dim = spark.createDataFrame([(3,), (4,)], "k long")
    bf = BloomFilter(bits=128, k_hashes=2).fit(dim, "k")
    plan = (fact.filter(bf.might_contain("k"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_guards(spark):
    with pytest.raises(ValueError):
        BloomFilter(bits=100)
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        BloomFilter().might_contain("k")
    with pytest.raises(ValueError):
        bloom_prune_join(df, df, on="k", how="left")
