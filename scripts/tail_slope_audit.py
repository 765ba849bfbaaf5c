"""Slope + job-count audit of the grown-absolute overhead-tail rows
(VERDICT r9 #2): expect_orders, join_bloom_prune, snapshot_diff.

For each query and scale factor: wall time (min of reps, interleaved)
AND the number of Spark jobs the query launches (via a job group) —
the job count answers the structural questions directly:

  * expect_orders — the 9-check suite must compile to ONE aggregate
    pass + ONE anti-join (a couple of jobs), not a job per check;
  * join_bloom_prune — the bloom fit is one aggregate job by design
    (fitted literal), the probe+join is the second; more jobs per run
    would mean the build re-fires;
  * snapshot_diff — one full-outer-join job; a superlinear slope would
    mean the diff re-scans a side.

Usage: python scripts/tail_slope_audit.py [reps] [sf_dir ...]
Defaults: 3 reps over /root/testdata/sf0.1, .scratch/sf1, .scratch/sf3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataframe_pipeline_spark.session import get_spark  # noqa: E402

NAMES = ["expect_orders", "join_bloom_prune", "snapshot_diff"]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.1", ".scratch/sf1",
                               ".scratch/sf3"]
    spark = get_spark("tail-slope")
    sc = spark.sparkContext
    qs = entrymod.queries()

    best: dict[tuple, float] = {}
    jobs: dict[tuple, int] = {}
    for rep in range(reps):
        for sf_dir in sf_dirs:
            for name in NAMES:
                key = (name, sf_dir)
                spark.catalog.clearCache()
                group = f"audit-{name}-{rep}-{os.path.basename(sf_dir)}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                sc.setJobGroup(None, None)
                n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                best[key] = min(best.get(key, 1e9), dt)
                jobs[key] = n_jobs

    out = {}
    for name in NAMES:
        row = {}
        for sf_dir in sf_dirs:
            tag = os.path.basename(sf_dir.rstrip("/"))
            row[tag] = {"wall_s": round(best[(name, sf_dir)], 3),
                        "jobs": jobs[(name, sf_dir)]}
        out[name] = row
        cells = "  ".join(
            f"{t}: {v['wall_s']:6.3f}s/{v['jobs']}j" for t, v in row.items())
        print(f"{name:18s} {cells}")
    dest = os.environ.get("TAIL_SLOPE_OUT")
    if dest:
        with open(dest, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
