"""Compare the Spark-vs-DuckDB ratio distribution across scale factors.

The fixed-overhead hypothesis (SCALE.md): queries 'slower than DuckDB'
at sf0.1 are sub-second absolute — JVM job-launch overhead — so at 10×
the data the ratio tail should collapse while data-dominated queries
keep their Spark win.  This script prints the evidence table from two
bench_vs_duckdb JSON files.

Usage: python scripts/scale_tail_analysis.py BENCH_VS_DUCK_r03.json \
           BENCH_VS_DUCK_sf1.json
"""

from __future__ import annotations

import json
import sys


def load(path):
    d = json.load(open(path))
    return {q: (v["spark_s"], v["duck_s"]) for q, v in d["queries"].items()}


def dist(queries):
    ratios = {q: s / max(d, 1e-9) for q, (s, d) in queries.items()}
    over2 = [q for q, r in ratios.items() if r > 2]
    over2_slow = [q for q in over2 if queries[q][0] > 2.0]
    wins = [q for q, r in ratios.items() if r < 1]
    tot_s = sum(s for s, _ in queries.values())
    tot_d = sum(d for _, d in queries.values())
    return ratios, over2, over2_slow, wins, tot_s, tot_d


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load(a_path), load(b_path)
    common = sorted(set(a) & set(b))
    print(f"common queries: {len(common)}")
    for name, qs in ((a_path, a), (b_path, b)):
        ratios, over2, over2_slow, wins, ts, td = dist(
            {q: qs[q] for q in common})
        print(f"\n== {name} ==")
        print(f"  aggregate: spark {ts:.1f}s vs duckdb {td:.1f}s "
              f"-> {ts / td:.2f}x")
        print(f"  spark wins (<1x): {len(wins)}  |  >2x: {len(over2)}  |  "
              f">2x AND spark >2s absolute: {len(over2_slow)}")
        if over2_slow:
            for q in sorted(over2_slow,
                            key=lambda q: -ratios[q])[:10]:
                s, d = qs[q]
                print(f"    {q:28s} spark {s:7.2f}s duck {d:7.2f}s "
                      f"({ratios[q]:.1f}x)")
    # per-query ratio movement
    moved = sorted(common, key=lambda q: (a[q][0] / max(a[q][1], 1e-9))
                   - (b[q][0] / max(b[q][1], 1e-9)), reverse=True)
    print("\n== biggest ratio improvements sf0.1 -> sf1 ==")
    for q in moved[:10]:
        ra = a[q][0] / max(a[q][1], 1e-9)
        rb = b[q][0] / max(b[q][1], 1e-9)
        print(f"  {q:28s} {ra:6.2f}x -> {rb:6.2f}x")


if __name__ == "__main__":
    main()
