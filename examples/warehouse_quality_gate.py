"""Warehouse analytics + quality gate: the round-4 tiers end-to-end.

A nightly-batch shape: (1) gate the incoming orders snapshot with a
declarative expectation suite (one-aggregate report + map-only
quarantine), (2) check distribution drift against the previous period
(PSI), (3) run the decision-support queries (extended TPC-H tier), and
(4) train a BPE subword vocabulary + bigram LM over the document corpus
for the downstream curation pipeline.  Run with an optional sf dir
argument.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark import expectations as ex  # noqa: E402
from dataframe_pipeline_spark.bpe import BpeTokenizer, BpeTrainer  # noqa: E402
from dataframe_pipeline_spark.profiling import psi_drift  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402
from dataframe_pipeline_spark.text import NgramScorer  # noqa: E402
from dataframe_pipeline_spark.tpch import (q_tpch_q10_returns,  # noqa: E402
                                           q_tpch_q14_promo,
                                           q_tpch_q21_waiting)

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    spark = get_spark("warehouse_quality_gate")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. expectation gate: every non-FK check in ONE aggregate pass
    suite = ex.ExpectationSuite(checks=[
        ex.not_null("o_custkey"),
        ex.in_set("o_orderstatus", ["F", "O", "P"]),
        ex.matches("o_orderpriority", "^[1-5]-"),
        ex.unique("o_orderkey"),
        ex.in_range("o_totalprice", 0, 10_000_000, max_bad_frac=0.0),
        ex.fk_in("o_custkey", customer, "c_custkey"),
    ])
    print("== expectation report ==")
    suite.report(orders).show(truncate=False)
    good, bad = ex.ExpectationSuite(checks=[
        ex.in_range("o_totalprice", 0, 400_000)]).quarantine(orders)
    print(f"quarantine: {good.count()} clean rows, {bad.count()} routed "
          f"to review (map-only split)")

    # 2. drift vs the previous period
    cut = F.lit("1999-01-01").cast("timestamp")
    print("== PSI drift, pre- vs post-1999 ==")
    psi_drift(orders.filter(F.col("o_orderdate") < cut),
              orders.filter(F.col("o_orderdate") >= cut),
              num_cols=["o_totalprice"],
              cat_cols=["o_orderpriority"]).show()

    # 3. decision support (three of the extended TPC-H tier)
    print("== Q10 top returns ==")
    q_tpch_q10_returns(spark, SF).show(5, truncate=12)
    print("== Q14 promo share ==")
    q_tpch_q14_promo(spark, SF).show()
    print("== Q21 suppliers who kept orders waiting ==")
    q_tpch_q21_waiting(spark, SF).show(5)

    # 4. corpus tokenizer + LM quality score for the curation pipeline
    trainer = BpeTrainer(n_merges=12).fit(docs, "text")
    print(f"== BPE: learned {len(trainer.merges_)} merges, "
          f"top: {trainer.merges_[:4]} ==")
    tok = BpeTokenizer(trainer.merges_)
    tok.token_counts(docs, "text").orderBy(F.desc("n")).show(5)
    lm = NgramScorer().fit(docs, "text")
    print("== lowest-LM-score docs (curation candidates) ==")
    lm.score(docs, "doc_id", "text").orderBy("avg_logprob").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
