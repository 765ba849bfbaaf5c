"""sf1 core-scaling read (VERDICT r12 #7): time the 24 headline rows
plus the window-path rows at 8 and at 32 cores, fresh JVM per core
count, page-cache warmed, one untimed warmup pass then min-of-2 per
query.  Reports the 8->32 speedup ratio per query: >=2x means the row
parallelizes at sf1; ~1x at sub-second walls means per-job fixed
overhead, not a serial plan.

Usage: python scripts/scaling_sf1_r13.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = [
    # headline 24
    "pipeline_flagship", "agg_group_mean", "agg_group_std", "freq_count",
    "label_encode", "onehot", "date_features", "minority",
    "scaler_standard", "strconcat", "function_native", "row_filter",
    "dedup_exact", "dedup_minhash_pairs", "text_token_count",
    "text_quality", "sim_topk_cosine", "events_hourly_agg", "sessionize",
    "asof_last_purchase", "events_rolling_30m", "tpch_pricing_summary",
    "top_revenue_orders", "revenue_by_nation",
    # window-path rows (r12 Fix 12 + r13 rewrites)
    "session_stats", "resample_user_daily", "tpch_q17_small_qty",
]

WORKER = r"""
import json, sys, time
sf_dir = sys.argv[1]; names = sys.argv[2:]
sys.path.insert(0, ".")
from dataframe_pipeline_spark.session import get_spark
import __spark_entry__ as entrymod
spark = get_spark("scaling-sf1")
qs = entrymod.queries()
import glob
for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
    try:
        spark.read.parquet(p).count()
    except Exception:
        pass
out = {}
for name in names:
    # one untimed warmup, then min-of-2 — each timed run clears the
    # cache first (bench.py discipline) so in-query persists cannot
    # leak a warm signature cache into the timed read
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = best
print("SCJSON:" + json.dumps(out))
"""


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run([sys.executable, "-c", WORKER, sf_dir] + ROWS,
                       capture_output=True, text=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    for line in r.stdout.splitlines():
        if line.startswith("SCJSON:"):
            return json.loads(line[7:])
    raise RuntimeError(r.stdout[-2000:] + r.stderr[-2000:])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALING_SF1_r13.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # ALTERNATE core counts per rep (ab_frozen_trees discipline): a
    # single 8-then-32 ordering reads machine drift as anti-scaling —
    # the two orderings disagreed by up to 2x on the same rows.
    t8: dict = {}
    t32: dict = {}
    for rep in range(reps):
        order = [(8, t8), (32, t32)] if rep % 2 == 0 else [(32, t32), (8, t8)]
        for cpus, acc in order:
            got = run(cpus, sf_dir)
            for n, v in got.items():
                acc[n] = min(acc.get(n, 1e9), v)
        print(f"rep {rep} done", flush=True)
    rows = {}
    for n in ROWS:
        rows[n] = {"t8_s": round(t8[n], 3), "t32_s": round(t32[n], 3),
                   "ratio_8_over_32": round(t8[n] / t32[n], 2)}
        print(f"{n:28s} 8c={t8[n]:7.3f}  32c={t32[n]:7.3f}  "
              f"ratio={t8[n]/t32[n]:5.2f}")
    with open(out_json, "w") as fh:
        json.dump({"sf_dir": sf_dir, "reps": reps,
                   "interleaved": True, "rows": rows}, fh, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
