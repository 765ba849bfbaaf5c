"""FrequencyEncoder — replace a value with its fit-time occurrence count.

Reference: /root/reference/dfpipeline/FrequencyEncoder.py — fit stores
``value_counts(normalize=...)`` (NaN excluded, pandas default); transform
maps values through the counts, unseen/NaN → 1 (raw counts) or 0.0
(normalized).

Spark-first: fit is ``groupBy(value).count()`` (map-side partial
aggregation, one shuffle on the value); normalization divides by the
non-null total inside the same job.  The counts live as a lookup DataFrame
joined back at transform — at 100 TB a counts table over a high-cardinality
column (e.g. device id) is far beyond literal-map size; the join
broadcast/shuffle decision is left to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase, nan_to_null


class FrequencyEncoder(SparkDFPBase):
    def __init__(self, inputs=None, outputs=None, normalize: bool = False):
        self.inputs = list(inputs or [])
        self.outputs = list(outputs or [])
        self.normalize = normalize
        self._lookups = {}  # input -> lookup DataFrame(__dfp_val, __dfp_cnt)
        assert len(self.inputs) == len(self.outputs)

    def fit(self, df: DataFrame, **params):
        self._lookups = {}
        for input in self.inputs:
            counts = (
                df.select(nan_to_null(df, input).alias("__dfp_val"))
                .filter(F.col("__dfp_val").isNotNull())
                .groupBy("__dfp_val")
                .agg(F.count(F.lit(1)).alias("__dfp_cnt"))
            )
            if self.normalize:
                # count/total inside one plan; total is a scalar subexpression
                # Catalyst evaluates once (no second scan of df at transform).
                total = counts.agg(F.sum("__dfp_cnt").alias("t"))
                counts = counts.crossJoin(F.broadcast(total)).select(
                    "__dfp_val",
                    (F.col("__dfp_cnt") / F.col("t")).alias("__dfp_cnt"),
                )
            self._lookups[input] = counts
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        default = 0.0 if self.normalize else 1
        for input, output, in zip(self.inputs, self.outputs):
            lookup = self._lookups[input]
            df = (
                df.join(lookup, on=nan_to_null(df, input) == lookup["__dfp_val"], how="left")
                .withColumn(output, F.coalesce(F.col("__dfp_cnt"), F.lit(default)))
                .drop("__dfp_val", "__dfp_cnt")
            )
        return df
