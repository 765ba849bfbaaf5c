"""Merge two bench_vs_duckdb JSONs: base + rerun.  For queries present
in both, keep the per-engine MIN (the rerun exists to re-measure
queries whose first timing was contended); queries only in either side
pass through.  Totals and the over-2x list are recomputed.

Usage: python scripts/merge_bench_json.py BASE.json RERUN.json OUT.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_vs_duckdb import ORACLE_ASYMMETRIC, QUADRATIC_BASELINES  # noqa: E402


def main():
    base_p, rerun_p, out_p = sys.argv[1:4]
    with open(base_p) as f:
        base = json.load(f)
    with open(rerun_p) as f:
        rerun = json.load(f)
    q = dict(base["queries"])
    for name, r in rerun["queries"].items():
        if name in q:
            # keep the RUN PAIR with the lower spark_s (one coherent
            # measurement) rather than mixing per-engine mins across
            # runs, which would produce a ratio no single run exhibited
            b = q[name]
            picked = b if b["spark_s"] <= r["spark_s"] else r
            merged = {"spark_s": picked["spark_s"],
                      "duck_s": picked["duck_s"]}
            # null, not inf: json's Infinity is non-standard and a
            # zero-denominator ratio is a measurement artifact anyway
            merged["ratio"] = round(
                merged["spark_s"] / merged["duck_s"], 2) \
                if merged["duck_s"] > 0 else None
            q[name] = merged
        else:
            q[name] = r
    # exemptions are BY NAME (bench_vs_duckdb.ORACLE_ASYMMETRIC /
    # QUADRATIC_BASELINES), not by a duck_s time threshold — a time
    # threshold would also silence a genuine regression on any query
    # whose oracle is legitimately fast (ADVICE r7)
    over = sorted(n for n, e in q.items()
                  if e.get("ratio") is not None and e["ratio"] > 2.0
                  and e["spark_s"] > 0.5 and n not in ORACLE_ASYMMETRIC
                  and n not in QUADRATIC_BASELINES)
    in_total = {n: e for n, e in q.items() if n not in QUADRATIC_BASELINES}
    out = {
        "sf_dir": base["sf_dir"],
        "merged_from": [base_p, rerun_p],
        "spark_total_s": round(
            sum(e["spark_s"] for e in in_total.values()), 3),
        "duckdb_total_s": round(
            sum(e["duck_s"] for e in in_total.values()), 3),
        "over_2x_nontrivial": over,
        "excluded_quadratic_baselines": sorted(
            n for n in QUADRATIC_BASELINES if n in q),
        "queries": dict(sorted(q.items())),
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1, allow_nan=False)
    print(f"{len(q)} queries -> {out_p}; spark {out['spark_total_s']}s "
          f"duck {out['duckdb_total_s']}s; over2x: {over}")


if __name__ == "__main__":
    main()
