"""Expectation-suite tests: check semantics, thresholds, quarantine
split, FK anti-join, and the one-aggregate-pass plan guarantee."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataframe_pipeline_spark import expectations as ex


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([
        Row(id=1, price=10.0, status="F", name="a-1", ts="2001-01-05"),
        Row(id=2, price=50.0, status="O", name="b-2", ts="2001-02-01"),
        Row(id=3, price=None, status="X", name="nope", ts="2000-12-31"),
        Row(id=3, price=999.0, status="F", name="c-3", ts="2001-03-01"),
    ]).withColumn("ts", F.col("ts").cast("timestamp"))


def _by_check(report):
    return {r["check"]: r for r in report.collect()}


def test_report_semantics(spark, df):
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("price"),
        ex.not_null("price", max_null_frac=0.5, name="price_soft"),
        ex.in_range("price", 0, 100),
        ex.in_set("status", ["F", "O"]),
        ex.matches("name", "^[a-c]-[0-9]$"),
        ex.unique("id"),
        ex.row_count(1, 10),
        ex.mean_between("price", 0, 400),
        ex.fresh("ts", "2001-03-01"),
    ], exact=True)
    r = _by_check(suite.report(df))
    assert not r["not_null(price)"]["passed"]           # 1/4 null
    assert r["not_null(price)"]["n_bad"] == 1
    assert r["price_soft"]["passed"]                    # 0.25 <= 0.5
    assert not r["in_range(price)"]["passed"]           # 999 out, NULL ok
    assert r["in_range(price)"]["n_bad"] == 1
    assert not r["in_set(status)"]["passed"]            # X
    assert not r["matches(name)"]["passed"]             # "nope"
    assert not r["unique(id)"]["passed"]                # id=3 twice
    assert r["unique(id)"]["n_bad"] == 1
    assert r["row_count"]["passed"] and r["row_count"]["observed"] == 4.0
    assert r["mean_between(price)"]["passed"]           # (10+50+999)/3=353
    assert round(r["mean_between(price)"]["observed"], 3) == 353.0
    assert r["fresh(ts)"]["passed"]


def test_fk_check_counts_orphans(spark, df):
    dim = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=2)])  # dup key
    suite = ex.ExpectationSuite(checks=[ex.fk_in("id", dim, "k"),
                                        ex.row_count(1, 10)])
    r = _by_check(suite.report(df))
    row = r["fk_in(id)"]
    assert not row["passed"] and row["n_bad"] == 2      # two id=3 rows
    # duplicate dim keys must not multiply rows: row_count still 4
    assert r["row_count"]["observed"] == 4.0


def test_fk_check_rides_one_job(spark, df):
    """fk checks must NOT union in extra jobs: the dim probe runs as a
    narrow (checked-column-only) 1-row sub-aggregate cross-joined
    (broadcast) onto the wide report — one plan, one action."""
    dim = spark.createDataFrame([Row(k=1), Row(k=2)])
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("price"), ex.fk_in("id", dim, "k")])
    plan = suite.report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    # wide agg pair + dim dedup pair + fk subtree pair
    assert plan.count("HashAggregate") <= 6
    # the fk subtree attaches as a broadcast 1-row cross join
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan


def test_exact_unique_decomposes_without_expand(spark, df):
    """exact unique must not re-key the wide aggregate: no Expand, and
    the distinct runs in its own broadcast-crossjoined subtree."""
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("price"), ex.unique("id"), ex.unique("status")],
        exact=True)
    plan = suite.report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "Union" not in plan
    assert plan.count("BroadcastNestedLoopJoin BuildRight, Cross") == 2


def test_single_aggregate_pass(spark, df):
    """All non-FK checks must compile into ONE aggregate over ONE scan —
    adding checks must never add jobs or scans."""
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("price"), ex.in_range("price", 0, 100),
        ex.in_set("status", ["F", "O"]), ex.row_count(1, 10),
        ex.mean_between("price", 0, 400), ex.fresh("ts", "2001-01-01"),
    ])
    plan = suite.report(df)._jdf.queryExecution().executedPlan().toString()
    # one partial+final pair, no Expand (approx distinct default), 1 scan
    assert plan.count("Scan ") <= 1
    assert "Expand" not in plan


def test_quarantine_split(spark, df):
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("price"), ex.in_set("status", ["F", "O"]),
        ex.unique("id"),  # table-level: ignored by quarantine
    ])
    good, bad = suite.quarantine(df)
    assert good.count() == 3  # ids 1, 2 and the second id=3 row
    rows = {r["id"]: set(r["_failed"]) for r in bad.collect()}
    assert rows[3] == {"not_null(price)", "in_set(status)"}
    # split is map-only — no exchange in either side
    for side in (good, bad):
        p = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p


def test_quarantine_requires_row_level(spark, df):
    with pytest.raises(ValueError, match="row-level"):
        ex.ExpectationSuite(checks=[ex.unique("id")]).quarantine(df)


def test_validate_or_raise(spark, df):
    ok = ex.ExpectationSuite(checks=[ex.row_count(1, 10)])
    ok.validate_or_raise(df)  # no raise
    assert ok.validate(df)
    bad = ex.ExpectationSuite(checks=[ex.row_count(100, 200)])
    assert not bad.validate(df)
    with pytest.raises(ValueError, match="expectation"):
        bad.validate_or_raise(df)


def test_approx_unique_default_has_no_expand(spark, df):
    suite = ex.ExpectationSuite(checks=[ex.unique("id"),
                                        ex.unique("status")])
    plan = suite.report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # HLL++ sketches, not distinct-expand


def test_approx_unique_tolerates_sketch_noise(spark):
    """A genuinely-unique key must PASS the approx unique check even
    when the HLL++ estimate lands below the true count (the sf0.001
    false-failure this guards against), while heavy duplication fails."""
    uniq = spark.range(0, 5000).withColumnRenamed("id", "k")
    suite = ex.ExpectationSuite(checks=[ex.unique("k")])
    assert _by_check(suite.report(uniq))["unique(k)"]["passed"]
    dup = uniq.withColumn("k", F.col("k") % 100)
    assert not _by_check(suite.report(dup))["unique(k)"]["passed"]
