"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the `noop` sink so every output column
is actually computed (a bare count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataframe_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pipeline_flagship",
    "agg_group_mean",
    "agg_group_std",
    "freq_count",
    "label_encode",
    "onehot",
    "date_features",
    "minority",
    "scaler_standard",
    "strconcat",
    "function_native",
    "row_filter",
]

EXT_HEADLINE = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_token_count",
    "text_quality",
    "sim_topk_cosine",
    "events_hourly_agg",
    "sessionize",
    "asof_last_purchase",
    "events_rolling_30m",
    "tpch_pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE + EXT_HEADLINE if n in qs]

    # Warm the JVM/session (codegen, shuffle, broadcast, window paths) with
    # a full pipeline run at the smallest SF so the first measured query
    # doesn't pay one-time startup cost.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    try:
        qs["pipeline_flagship"](spark, "/root/testdata/sf0.001").write \
            .format("noop").mode("overwrite").save()
    except Exception:
        pass

    times = {}
    for name in names:
        # min of 2 runs: steady-state time (first run pays one-time JIT /
        # codegen / cache-population costs that a long-lived cluster
        # session amortizes away)
        best = None
        for _ in range(2):
            # each measurement pays its own full cost (incl. any persist
            # the query does) and leaves no cache behind for neighbors
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
