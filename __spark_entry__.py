"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-operator pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (see dataframe_pipeline_spark/queries.py); DuckDB-verified
at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_pipeline_spark.queries import CORE_QUERIES  # noqa: E402

try:  # extension queries land incrementally; keep the contract importable
    from dataframe_pipeline_spark.ext_queries import EXT_QUERIES
except ImportError:
    EXT_QUERIES = {}

try:
    from dataframe_pipeline_spark.tpch import TPCH_QUERIES
except ImportError:
    TPCH_QUERIES = {}

# Queries with the STALEST driver check enumerate FIRST, so the
# driver's 50-query correctness sampler lands on them instead of on the
# freshly-verified tail.  Coverage math as of round 11: the registry
# was 180 queries in r10, and the union of CORRECTNESS_r01..r10 covers
# all 180 with a green latest check.  r10's front-list held 59 rows
# (17 r10-changed + 4 r5 leftovers + 38 r6-checked — note 38, not the
# 39 a prior comment claimed; the sampler takes the first 50 either
# way), so the last 9 r6 rows (shard_layout ... zorder_key_orders,
# untouched by r10's check) roll to the FRONT here.  After them: every
# row whose code or oracle changed in r11.  Everything is also locally
# verified each round regardless (scripts/check_oracle.py at sf0.01 —
# full-registry runs r7..r10, changed-subset r11).
_NEVER_CHECKED_FIRST = [
    # -- r6-checked rollovers r10's 50-sample did not reach ------------
    "shard_layout", "shard_stats", "tpch_q20_excess", "tpch_q2_mincost",
    "strconcat", "strsplit_index", "strsplit_sep",
    "wrap_label_encode", "zorder_key_orders",
    # -- r11 changed these queries' code/oracle — re-verify next -------
    "join_salted_auto",          # new in r11 (statistics-gated salting)
    "events_ann_annotate",       # new in r11 (streaming-ANN batch twin)
    "sim_ann_annotate",          # ranked oracle now orders by ROUND(rawc,6)
    # overflow gate rewritten to exact footer row counts (shared helper
    # of the cents family; gate outcome unchanged at test scale but the
    # code path is new)
    "tpch_pricing_summary", "revenue_rollup", "revenue_by_nation",
    "top_revenue_orders", "tpch_q7_volume", "tpch_q8_share",
    "tpch_q9_profit", "tpch_q10_returns", "tpch_q11_value",
    "tpch_q14_promo", "tpch_q15_top_supplier", "tpch_q19_disjunct",
    "dedup_clusters", "dedup_keep_canonical",  # cc failure-path release
]

_MERGED = {**CORE_QUERIES, **EXT_QUERIES, **TPCH_QUERIES}
_ALL = {
    **{k: _MERGED[k] for k in _NEVER_CHECKED_FIRST if k in _MERGED},
    **_MERGED,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataframe_pipeline_spark.queries import q_pipeline_flagship

    return q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01",
               names=None) -> dict[str, str]:
    """Oracle SQL per query.  Most oracles are static strings (or
    parameter-generated at import); data-dependent ones (sim_ann_ivf,
    whose fitted centroids are literals) are registered as callables and
    resolved here against ``sf_dir`` — the driver calls with no args and
    gets its correctness scale (sf0.01); scripts pass their actual
    sf_dir so the generated literals match the data they benchmark.

    ``names`` (optional, scripts only — the driver passes nothing)
    restricts resolution to a subset: generator oracles re-run their
    fit (k-means, PQ codebooks) against sf_dir, so resolving all ~15
    of them costs minutes at sf1+ — wasteful when a script benchmarks
    three queries."""
    out: dict[str, str] = {}
    for name, (_fn, sql) in _ALL.items():
        if names is not None and name not in names:
            continue
        if callable(sql):
            sql = sql(sf_dir)
        if sql is not None:
            out[name] = sql
    return out
