"""RangeTransformer — map values in (upper, lower) ranges to replacements.

Reference: /root/reference/dfpipeline/RangeTransformer.py — dict keys are
``(upper, lower)`` tuples (inclusive both ends, None = unbounded,
``(None, None)`` ignored); entries are applied *in dict order over the
original column values* with last match winning; replacement values may be
literals or the strings ``'mean' | 'median' | 'most_frequent'``, computed
**at transform time** over the *matched subset* (or the whole column when
``use_all_elements=True``).  NaN matches nothing and passes through.

Spark-first: each statistic replacement triggers one small transform-time
aggregate job (range dicts are tiny config, 2–5 entries); the rewrite is a
nested
``F.when`` chain built so that later dict entries wrap (and thus override)
earlier ones — pure codegen.  ``most_frequent`` uses max-count with
smallest-value tie-break (pandas ``value_counts().idxmax()`` order is
undefined on ties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase, nan_to_null

_STATS = ("mean", "median", "most_frequent")


class RangeTransformer(SparkDFPBase):
    def __init__(self, inputs=None, outputs=None, dict=None, use_all_elements: bool = False):
        self.inputs = list(inputs or [])
        self.outputs = list(outputs or [])
        self.dict = dict or {}
        self.use_all_elements = use_all_elements
        self.values_dict = {}  # (col, upper, lower) -> float replacement, like the reference

    @staticmethod
    def _range_cond(col: Column, upper, lower):
        if upper is None and lower is None:
            return None  # ignored entry
        cond = F.lit(True)
        if upper is not None:
            cond = cond & (col <= F.lit(upper))
        if lower is not None:
            cond = cond & (col >= F.lit(lower))
        return cond

    def _stat_value(self, df: DataFrame, input: str, cond, stat: str):
        v = nan_to_null(df, input)
        tgt = v if self.use_all_elements else F.when(cond, v)
        if stat == "mean":
            return df.agg(F.mean(tgt)).collect()[0][0]
        if stat == "median":
            return df.agg(F.percentile(tgt, F.lit(0.5))).collect()[0][0]
        # most_frequent: mode of the subset, ties → smallest value
        sub = df.select(tgt.alias("v")).filter(F.col("v").isNotNull())
        row = (
            sub.groupBy("v").count().orderBy(F.col("count").desc(), F.col("v")).limit(1).collect()
        )
        return row[0]["v"] if row else None

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.dict:
            return df
        for input, output in zip(self.inputs, self.outputs):
            col = nan_to_null(df, input)
            expr = F.col(input)
            for (upper, lower), v in self.dict.items():
                cond = self._range_cond(col, upper, lower)
                if cond is None:
                    continue
                if isinstance(v, str) and v in _STATS:
                    newv = self._stat_value(df, input, cond, v)
                else:
                    newv = v
                try:
                    self.values_dict[(input, upper, lower)] = float(newv)
                except (TypeError, ValueError):
                    self.values_dict[(input, upper, lower)] = newv
                # Wrap the accumulated expression: later entries evaluate
                # first in the final CASE, i.e. last dict entry wins.
                expr = F.when(cond, F.lit(newv)).otherwise(expr)
            df = df.withColumn(output, expr)
        return df
