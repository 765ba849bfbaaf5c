"""End-to-end model boundary: preprocess with the pipeline, fit a
two-member classifier ensemble driver-side, score distributed, average —
the reference's MLPipelineBenchmark predict flow
(/root/reference/benchmarks/MLPipelineBenchmark.py:96-127) re-expressed
Spark-first: fit on a bounded collected sample (the wrap tier), score as
a map-only Arrow-batched pass (the 100 TB path).

Run: python examples/ensemble_scoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import dataframe_pipeline_spark as dfp  # noqa: E402
from dataframe_pipeline_spark import features, get_spark  # noqa: E402
from dataframe_pipeline_spark.models import (  # noqa: E402
    NumpyLogisticRegression, collect_training_matrix, ensemble_proba_fn)

FEATS = ["q_s", "p_s", "d_s", "t_s"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("ensemble-scoring")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    pipe = dfp.DataframePipeline(steps=[
        dfp.Scaler(inputs=["l_quantity"], outputs=["q_s"], strategy="minmax"),
        dfp.Scaler(inputs=["l_extendedprice"], outputs=["p_s"],
                   strategy="minmax"),
        dfp.Scaler(inputs=["l_discount"], outputs=["d_s"], strategy="minmax"),
        dfp.Scaler(inputs=["l_tax"], outputs=["t_s"], strategy="minmax"),
    ])
    prepped = (pipe.fit_transform(li)
               .withColumn("label", (F.col("l_returnflag") == "R").cast("int")))

    X, y = collect_training_matrix(prepped, FEATS, "label")
    clfs = [NumpyLogisticRegression(lr=0.2, n_iter=300).fit(X, y),
            NumpyLogisticRegression(lr=0.1, n_iter=150, l2=0.01).fit(X, y)]

    scored = features.score_with(prepped, FEATS, ensemble_proba_fn(clfs),
                                 output="fraud_score")
    agg = scored.agg(F.count("*").alias("rows"),
                     F.avg("fraud_score").alias("mean_score"),
                     F.avg((F.col("fraud_score") >= 0.5).cast("int")
                           ).alias("pred_pos_rate"),
                     F.avg("label").alias("true_pos_rate")).first()
    print(f"[ensemble-scoring] rows={agg.rows} mean_score={agg.mean_score:.4f}"
          f" pred_pos_rate={agg.pred_pos_rate:.4f}"
          f" true_pos_rate={agg.true_pos_rate:.4f}")
    scored.select("l_orderkey", "l_linenumber", "label", "fraud_score").show(5)


if __name__ == "__main__":
    main()
