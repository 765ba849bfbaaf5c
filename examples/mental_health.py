"""MentalHealth1-shaped pipeline over the synthetic customer table.

Re-expresses /root/reference/benchmarks/mental_health_1/
MentalHealth1.py:114-203: constant imputation, a lowercase lambda, dict
cleanup maps, a row filter that drops garbage values, median
imputation, a median-substituting range clamp, label encoding, a
column drop, and min-max scaling.  NULLs are synthesized
deterministically since the testdata has none.
"""

from pyspark.sql import functions as F

from _runner import run

import dataframe_pipeline_spark as dfp


def prep(df):
    # synthesize missing values: every 7th acctbal, every 11th segment
    return (
        df.withColumn("c_acctbal", F.when(F.col("c_custkey") % 7 == 0,
                                          None).otherwise(F.col("c_acctbal")))
        .withColumn("c_mktsegment",
                    F.when(F.col("c_custkey") % 11 == 0, None)
                    .otherwise(F.col("c_mktsegment")))
    )


def build(df):
    return dfp.DataframePipeline(steps=[
        dfp.Imputer(inputs=["c_nationkey"], outputs=["c_nationkey"], val=0),
        dfp.Imputer(inputs=["c_mktsegment"], outputs=["c_mktsegment"],
                    val="NaN"),
        dfp.FunctionTransformer(inputs=["c_mktsegment"], outputs=["seg"],
                                func=lambda x: str.lower(x)),
        dfp.MapTransformer(inputs=["seg"], outputs=["seg"],
                           dict={"nan": "unknown", "building": "bld",
                                 "automobile": "auto"}),
        dfp.RowTransformer(columns=["seg"], drop_values=["furniture"]),
        dfp.Imputer(inputs=["c_acctbal"], outputs=["c_acctbal"],
                    strategy="median"),
        dfp.RangeTransformer(inputs=["c_acctbal"], outputs=["c_acctbal"],
                             dict={(None, 9000.0): "median",
                                   (0.0, None): "median"}),
        dfp.ComplementLabelEncoder(inputs=["seg"], outputs=["seg_id"]),
        dfp.ColumnSelector(columns=["c_name"], drop=True),
        dfp.Scaler(inputs=["c_acctbal"], outputs=["c_acctbal"],
                   strategy="minmax"),
    ])


if __name__ == "__main__":
    run("mental_health", build, table="customer", prep=prep)
