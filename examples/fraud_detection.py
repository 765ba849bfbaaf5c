"""FraudDetection1-shaped pipeline over the synthetic lineitem table.

Re-expresses the richest reference pipeline
(/root/reference/benchmarks/fraud_detection_1/FraudDetection1.py:127-168)
Spark-first: lambda features, label encoding, min-scaling, string-concat
composite keys re-encoded and frequency-encoded, grouped mean/std
aggregates joined back, a cents feature, and a column drop — one lazy
Catalyst plan; every fitted statistic is a broadcastable lookup
DataFrame, never a driver dict.
"""

import math

from _runner import run

import dataframe_pipeline_spark as dfp


def build(df):
    return dfp.DataframePipeline(steps=[
        # TransactionDT / 86400.0 analog: ship-date offset in days
        dfp.FunctionTransformer(inputs=["l_orderkey"], outputs=["day"],
                                func=lambda x: x / 86400.0),
        # D-column re-basing analog: x - y over column pairs
        dfp.FunctionTransformer(inputs=[("l_extendedprice", "l_discount")],
                                outputs=["net"], func=lambda x, y: x - y),
        dfp.ComplementLabelEncoder(inputs=["l_returnflag", "l_linestatus"],
                                   outputs=["l_returnflag", "l_linestatus"]),
        dfp.Scaler(inputs=["l_quantity", "l_tax"],
                   outputs=["l_quantity", "l_tax"], strategy="min"),
        # card1_addr1-style composite key: concat, re-encode, freq-encode
        dfp.StringConcatenator(inputs=[("l_partkey", "l_suppkey")],
                               outputs=["part_supp"], separator="_"),
        dfp.ComplementLabelEncoder(inputs=["part_supp"], outputs=["part_supp_id"]),
        dfp.FrequencyEncoder(inputs=["l_suppkey", "part_supp"],
                             outputs=["supp_FE", "part_supp_FE"], normalize=True),
        # encode_AG analog: grouped mean + std joined back on the group key
        dfp.Aggregator(inputs=["l_extendedprice", "l_extendedprice"],
                       outputs=["price_supp_mean", "price_part_mean"],
                       groupby=["l_suppkey", "l_partkey"], func="mean"),
        dfp.Aggregator(inputs=["l_extendedprice", "l_extendedprice"],
                       outputs=["price_supp_std", "price_part_std"],
                       groupby=["l_suppkey", "l_partkey"], func="std"),
        # cents feature
        dfp.FunctionTransformer(inputs=["l_extendedprice"], outputs=["cents"],
                                func=lambda x: x - math.floor(x), returns=float),
        dfp.ColumnSelector(columns=["l_comment", "l_shipinstruct", "l_shipmode"],
                           drop=True),
    ])


if __name__ == "__main__":
    run("fraud_detection", build, table="lineitem")
