"""Entity resolution / master-data pipeline over the customer table.

The MDM loop a data platform runs when two systems hold overlapping
records of the same entities:

  1. diagnose candidate blocking keys (key_skew — a country-sized
     block would make the pair stage quadratic);
  2. link: blocked + weighted fuzzy field scoring (RecordLinker);
  3. resolve: transitive closure over linked pairs
     (connected_components) → one master id per entity cluster;
  4. survive: keep the canonical (min-id) record per cluster
     (keep_canonical) — the deduplicated golden table.

Run: python examples/entity_resolution.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataframe_pipeline_spark.dedup import (RecordLinker,  # noqa: E402
                                            connected_components,
                                            keep_canonical)
from dataframe_pipeline_spark.profiling import key_skew  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF
    spark = get_spark("entity-resolution")
    cu = (spark.read.parquet(f"{sf_dir}/customer.parquet")
          .withColumn("__prefix", F.substring("c_name", 1, 14)))

    print("== 1. blocking-key diagnosis (biggest blocks) ==")
    blocked_key = F.concat_ws("|", "c_nationkey", "c_mktsegment", "__prefix")
    key_skew(cu.withColumn("__block", blocked_key), "__block", top=5).show(
        truncate=False)

    print("== 2. link: blocked + weighted Levenshtein scoring ==")
    linker = RecordLinker(
        block_on=["c_nationkey", "c_mktsegment", "__prefix"],
        compare={"c_name": 1.0}, threshold=0.93)
    pairs = linker.pairs(cu, "c_custkey")
    n_pairs = pairs.count()
    print(f"   linked pairs >= 0.93: {n_pairs}")

    print("== 3. resolve: transitive clusters ==")
    clusters = connected_components(pairs)
    n_entities = clusters.select("comp").distinct().count()
    print(f"   {clusters.count()} linked records form "
          f"{n_entities} entity clusters")

    print("== 4. survive: canonical record per cluster ==")
    golden = keep_canonical(cu.drop("__prefix"), pairs, id_col="c_custkey")
    print(f"   {cu.count()} records -> {golden.count()} golden records")
    golden.select("c_custkey", "c_name", "c_mktsegment").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
