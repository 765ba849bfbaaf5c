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

_ALL = {**CORE_QUERIES, **EXT_QUERIES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataframe_pipeline_spark.queries import q_pipeline_flagship

    return q_pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
