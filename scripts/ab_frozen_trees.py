"""Interleaved A/B of registered queries across two REPO TREES
(VERDICT r12 #3: settle the driver-read headline regressions against a
frozen fb370c7 (r11-boundary) worktree instead of an in-script frozen
shape).

Each rep runs one subprocess per tree (fresh JVM, same warmup: page-cache
the tables + one untimed run), times min-of-2 noop-sink runs per query,
and the trees ALTERNATE A/B/A/B so VM drift hits both arms equally.  The
reported number per (tree, query) is the min over reps; medians are kept
as the load-noise tell.

Usage:
  python scripts/ab_frozen_trees.py <treeA> <treeB> <sf_dir> <reps> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
tree = sys.argv[1]; sf_dir = sys.argv[2]; names = sys.argv[3:]
sys.path.insert(0, tree)
os.chdir(tree)
from dataframe_pipeline_spark.session import get_spark
import __spark_entry__ as entrymod
spark = get_spark("ab-frozen")
qs = entrymod.queries()
import glob
for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
    try:
        spark.read.parquet(p).count()
    except Exception:
        pass
out = {}
for name in names:
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    out[name] = min(runs)
print("ABJSON:" + json.dumps(out))
spark.stop()
"""


def run_tree(tree: str, sf_dir: str, names: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    p = subprocess.run([sys.executable, "-c", WORKER, tree, sf_dir] + names,
                       capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"worker failed for {tree}:\n{p.stdout[-2000:]}\n"
                       f"{p.stderr[-2000:]}")


def main():
    tree_a, tree_b, sf_dir, reps = (sys.argv[1], sys.argv[2], sys.argv[3],
                                    int(sys.argv[4]))
    names = sys.argv[5:]
    hist: dict[str, dict[str, list[float]]] = {
        t: {n: [] for n in names} for t in (tree_a, tree_b)}
    for rep in range(reps):
        # alternate which tree goes first so slot effects cancel
        order = (tree_a, tree_b) if rep % 2 == 0 else (tree_b, tree_a)
        for t in order:
            res = run_tree(t, sf_dir, names)
            for n, v in res.items():
                hist[t][n].append(v)
            print(f"rep {rep} {t}: "
                  + " ".join(f"{n}={v:.3f}" for n, v in res.items()),
                  flush=True)
    summary = {}
    for n in names:
        a = hist[tree_a][n]
        b = hist[tree_b][n]
        summary[n] = {
            "treeA_min": round(min(a), 3), "treeA_med": round(
                statistics.median(a), 3),
            "treeB_min": round(min(b), 3), "treeB_med": round(
                statistics.median(b), 3),
            "min_ratio_B_over_A": round(min(b) / min(a), 3),
        }
        print(f"{n:24s} A(min/med)={min(a):.3f}/{statistics.median(a):.3f}  "
              f"B(min/med)={min(b):.3f}/{statistics.median(b):.3f}  "
              f"B/A={min(b)/min(a):.3f}")
    out = os.environ.get("AB_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump({"treeA": tree_a, "treeB": tree_b, "sf_dir": sf_dir,
                       "reps": reps, "runs": hist, "summary": summary},
                      fh, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
