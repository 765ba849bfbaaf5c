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

# Queries the driver's 50-query correctness sampler has never covered
# enumerate FIRST, so the sampler's cap lands on the already
# driver-verified tail instead of on these.  As of round 5 the union of
# CORRECTNESS_r01..r05 covers the full prior registry (150/150), so
# this list now holds only the round-6 additions; everything is locally
# verified regardless (scripts/check_oracle.py at sf0.01).
_NEVER_CHECKED_FIRST = [
    "multimodal_gif_frames",        # animated-GIF sampling (r6)
    "tpch_q2_mincost",              # adapted TPC-H completions (r6)
    "tpch_q11_value",
    "tpch_q12_priority_class",
    "tpch_q16_variety",
    "tpch_q20_excess",
    "mix_temperature",              # corpus-layout ops (r6)
    "shard_stats",
    "shard_layout",
    "zorder_key_orders",
    "corpus_curation",
    "sim_ann_pq",                   # product-quantization ANN (r6)
    "sim_ann_pq_rerank",
    "dedup_semantic",               # SemDeDup cluster-bucketed dedup (r6)
    "cluster_embeddings",           # k-means clustering profile (r6)
    "sim_ann_ivfpq",                # IVF-PQ composite ANN (r6)
    "dedup_substring",              # ExactSubstr span dedup (r6)
    "dedup_substring_trim",
    "text_bm25_topk",               # BM25 lexical retrieval (r6)
    "cms_user_counts",              # composed Count-Min sketch (r6)
    "join_bloom_prune",             # bloom-pruned fact join (r6)
    "sim_ann_ivf_append",           # incremental IVF maintenance (r6)
    "text_unigram_tokens",          # unigram-LM tokenizer (r6)
    "text_unigram_vocab",
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
