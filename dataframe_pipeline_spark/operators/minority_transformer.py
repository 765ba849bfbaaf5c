"""MinorityTransformer — replace values whose occurrence count is below a
threshold.

Reference: /root/reference/dfpipeline/MinorityTransformer.py — counts are
computed **at transform time** (``value_counts`` on the frame being
transformed, SURVEY §2 quirk 1); values with count < threshold — and NaN,
whose count lookup misses — become ``replaced_to``.

Spark-first: transform-time ``groupBy(value).count()`` + left join back +
``when(count >= threshold, col).otherwise(replaced_to)``.  One shuffle on
the value column with map-side partial counts; NULL/NaN never matches the
join so its count is NULL → condition false → replaced, matching pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase, nan_to_null


class MinorityTransformer(SparkDFPBase):
    def __init__(self, inputs=None, outputs=None, threshold=None, replaced_to=None):
        self.inputs = list(inputs or [])
        self.outputs = list(outputs or [])
        self.threshold = threshold
        self.replaced_to = replaced_to

    def transform(self, df: DataFrame) -> DataFrame:
        for input, output in zip(self.inputs, self.outputs):
            counts = (
                df.select(nan_to_null(df, input).alias("__dfp_val"))
                .filter(F.col("__dfp_val").isNotNull())
                .groupBy("__dfp_val")
                .agg(F.count(F.lit(1)).alias("__dfp_cnt"))
            )
            df = (
                df.join(counts, on=nan_to_null(df, input) == counts["__dfp_val"], how="left")
                .withColumn(
                    output,
                    F.when(F.col("__dfp_cnt") >= F.lit(self.threshold), F.col(input))
                    .otherwise(F.lit(self.replaced_to)),
                )
                .drop("__dfp_val", "__dfp_cnt")
            )
        return df
