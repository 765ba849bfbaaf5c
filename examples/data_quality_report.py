"""Data-quality report + curation pass over a corpus snapshot.

The pre-training audit loop a data team runs on every corpus drop:

  1. profile every column in one pass (nulls, cardinality, ranges);
  2. histogram + correlation sanity checks on the numeric signals;
  3. winsorize outliers (fitted quantile clamp);
  4. cross-snapshot merge of a change batch (latest-wins CDC);
  5. pivot a per-source quality summary for the report.

Everything is built from the engine's profiling/relational/reshape
tiers — one Spark session, declarative plans throughout, every step an
operator that is oracle-checked in __spark_entry__.py.

Run: python examples/data_quality_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark.operators.outlier_clipper import OutlierClipper  # noqa: E402
from dataframe_pipeline_spark.profiling import (correlation_matrix,  # noqa: E402
                                                histogram, profile)
from dataframe_pipeline_spark.reshape import pivot_agg  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.sources import merge_latest  # noqa: E402
from dataframe_pipeline_spark.text import QualityScorer  # noqa: E402

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    spark = get_spark("data-quality-report")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== 1. column profile (one aggregate, one scan) ==")
    profile(docs).show(truncate=20)

    print("== 2. doc-length histogram + quality-signal correlations ==")
    histogram(docs, "n_chars", n_bins=8).show()
    scored = QualityScorer().transform(docs)
    num_cols = [c for c, t in scored.dtypes
                if t in ("double", "bigint") and c != "doc_id"][:3]
    correlation_matrix(scored, num_cols).show()

    print("== 3. winsorize n_chars (fitted p01/p99 clamp) ==")
    clip = OutlierClipper(inputs=["n_chars"], outputs=["n_chars_w"],
                          strategy="quantile", lo_q=0.01, hi_q=0.99)
    clipped = clip.fit_transform(docs)
    print(f"   bounds: {clip.bounds_[0]}")

    print("== 4. latest-wins merge of a change batch ==")
    changes = (docs.filter(F.col("doc_id") % 97 == 0)
               .withColumn("text", F.upper("text")))
    merged = merge_latest(docs.withColumn("__v", F.lit(0)),
                          changes.withColumn("__v", F.lit(1)),
                          "doc_id", "__v")
    print(f"   snapshot {docs.count()} rows + {changes.count()} changes "
          f"-> {merged.count()} rows (upserted in place)")

    print("== 5. per-source report: docs per language (pivoted) ==")
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    pivot_agg(docs, "source", "lang", sorted(langs),
              lambda cond: F.count(F.when(cond, 1)), prefix="n_") \
        .orderBy("source").show()

    _ = clipped  # full report would persist these columns
    spark.stop()


if __name__ == "__main__":
    main()
