"""Golden-frame tests ported from /root/reference/dfpipeline/tests/test_agg.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal


def _df(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "col1": [2, 2, 4, 4],
            "col2": ["device-1", "device-1", "device-2", "device-2"],
        })
    )


def test_mean(spark):
    agg = dfp.Aggregator(inputs=["col1"], outputs=["mean"], func="mean")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "mean": [3.0, 3.0, 3.0, 3.0],
    }))


def test_groupby_mean(spark):
    agg = dfp.Aggregator(inputs=["col1"], outputs=["mean_to_col2"], groupby=["col2"], func="mean")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "mean_to_col2": [2.0, 2.0, 4.0, 4.0],
    }))


def test_groupby_count(spark):
    agg = dfp.Aggregator(inputs=["col2"], outputs=["count"], groupby=["col2"], func="count")
    out = agg.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({
        "col1": [2, 2, 4, 4],
        "col2": ["device-1", "device-1", "device-2", "device-2"],
        "count": [2, 2, 2, 2],
    }))


def test_groupby_std_unseen_key(spark):
    """Transform on a frame containing a key unseen at fit → NULL (pandas map miss)."""
    agg = dfp.Aggregator(inputs=["col1"], outputs=["std_to_col2"], groupby=["col2"], func="std")
    agg.fit(_df(spark))
    test = spark.createDataFrame(
        pd.DataFrame({"col1": [1, 1], "col2": ["device-1", "device-9"]})
    )
    out = agg.transform(test)
    assert_frames_equal(out, pd.DataFrame({
        "col1": [1, 1],
        "col2": ["device-1", "device-9"],
        "std_to_col2": [0.0, None],
    }))


def test_sketch_aggregates_close_to_exact(spark):
    """approx_nunique (HLL++) and approx_median (percentile_approx)
    track their exact counterparts within the configured error — the
    bounded-memory tier for groups too hot for exact distinct/percentile
    at scale."""
    from dataframe_pipeline_spark.operators import Aggregator

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    a1 = Aggregator(inputs=["l_partkey"], outputs=["nu"],
                    groupby=["l_returnflag"], func="approx_nunique").fit(li)
    e1 = Aggregator(inputs=["l_partkey"], outputs=["nu"],
                    groupby=["l_returnflag"], func="nunique").fit(li)
    a2 = Aggregator(inputs=["l_extendedprice"], outputs=["md"],
                    groupby=["l_returnflag"], func="approx_median").fit(li)
    e2 = Aggregator(inputs=["l_extendedprice"], outputs=["md"],
                    groupby=["l_returnflag"], func="median").fit(li)

    def vals(agg):
        out = agg.transform(li).select("l_returnflag", agg.outputs[0])
        return {r[0]: r[1] for r in out.distinct().collect()}

    av, ev = vals(a1), vals(e1)
    for k in ev:
        assert abs(av[k] - ev[k]) / ev[k] < 0.05, (k, av[k], ev[k])
    av, ev = vals(a2), vals(e2)
    for k in ev:
        assert abs(av[k] - ev[k]) / ev[k] < 0.05, (k, av[k], ev[k])


def test_fused_fit_transform_uses_window_not_join(spark):
    """fit_transform over one frame computes grouped outputs as a window
    aggregate (one exchange, no lookup join, no second scan); transform
    over a DIFFERENT frame keeps the fitted-lookup join with unseen keys
    nulling out.  Values are identical between the two paths."""
    import pandas as pd

    from dataframe_pipeline_spark.operators import Aggregator

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    agg = Aggregator(inputs=["l_extendedprice"], outputs=["m"],
                     groupby=["l_suppkey"], func="mean")
    fused = agg.fit_transform(li)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "__dfp_key" not in plan            # no lookup join
    assert plan.count("Exchange") <= 1        # one hash exchange total

    # a different frame (same plan, different object) takes the join path
    joined = agg.transform(li.select("*"))
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "__dfp_key" in jplan

    a = sorted(map(tuple, fused.select("l_orderkey", "l_linenumber", "m").collect()))
    b = sorted(map(tuple, joined.select("l_orderkey", "l_linenumber", "m").collect()))
    assert a == b

    # non-windowable funcs keep the join even when fused
    med = Aggregator(inputs=["l_extendedprice"], outputs=["md"],
                     groupby=["l_suppkey"], func="median")
    mplan = (med.fit_transform(li)._jdf.queryExecution()
             .executedPlan().toString())
    assert "__dfp_key" in mplan
